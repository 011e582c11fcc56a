"""Exhaustive transform coverage: every one of the 43 concrete node types
(reference modeling.py:933-1169) evaluated against its NumPy semantics,
plus the framework-extension transforms (Log1p, Expm1).
"""

import numpy as np
import pytest

from probabilit_tpu import modeling as m


def _eval(node):
    return np.asarray(node.sample(64, random_state=0))


def _ref_inputs(node_graph_inputs):
    return [np.asarray(v.samples_) for v in node_graph_inputs]


UNARY_CASES = [
    (m.Negate, np.negative, (-2, 2)),
    (m.Abs, np.abs, (-2, 2)),
    (m.Log, np.log, (0.1, 3)),
    (m.Exp, np.exp, (-2, 2)),
    (m.Floor, np.floor, (-5, 5)),
    (m.Ceil, np.ceil, (-5, 5)),
    (m.Sign, np.sign, (-2, 2)),
    (m.Sqrt, np.sqrt, (0.01, 4)),
    (m.Square, np.square, (-3, 3)),
    (m.Log10, np.log10, (0.1, 10)),
    (m.Sin, np.sin, (-3, 3)),
    (m.Cos, np.cos, (-3, 3)),
    (m.Tan, np.tan, (-1, 1)),
    (m.Arcsin, np.arcsin, (-0.99, 0.99)),
    (m.Arccos, np.arccos, (-0.99, 0.99)),
    (m.Arctan, np.arctan, (-3, 3)),
    (m.Sinh, np.sinh, (-2, 2)),
    (m.Cosh, np.cosh, (-2, 2)),
    (m.Tanh, np.tanh, (-2, 2)),
    (m.Arcsinh, np.arcsinh, (-3, 3)),
    (m.Arccosh, np.arccosh, (1.01, 5)),
    (m.Arctanh, np.arctanh, (-0.9, 0.9)),
    # Framework extensions (no reference counterpart): stable near 0.
    (m.Log1p, np.log1p, (-0.9, 3)),
    (m.Expm1, np.expm1, (-2, 2)),
]


class TestUnaryTransforms:
    @pytest.mark.parametrize("node_cls,np_fn,rng", UNARY_CASES,
                             ids=[c[0].__name__ for c in UNARY_CASES])
    def test_matches_numpy(self, node_cls, np_fn, rng):
        lo, hi = rng
        x = m.Distribution("uniform", loc=lo, scale=hi - lo)
        out = _eval(node_cls(x))
        expected = np_fn(np.asarray(x.samples_))
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=1e-6)


BINARY_CASES = [
    (m.FloorDivide, np.floor_divide),
    (m.Mod, np.mod),
    (m.Divide, np.divide),
    (m.Power, np.power),
    (m.Subtract, np.subtract),
    (m.Equal, np.equal),
    (m.NotEqual, np.not_equal),
    (m.LessThan, np.less),
    (m.LessThanOrEqual, np.less_equal),
    (m.GreaterThan, np.greater),
    (m.GreaterThanOrEqual, np.greater_equal),
    (m.IsClose, np.isclose),
    (m.Arctan2, np.arctan2),
]


class TestBinaryTransforms:
    @pytest.mark.parametrize("node_cls,np_fn", BINARY_CASES,
                             ids=[c[0].__name__ for c in BINARY_CASES])
    def test_matches_numpy(self, node_cls, np_fn):
        a = m.Distribution("uniform", loc=0.5, scale=3)
        b = m.Distribution("uniform", loc=0.5, scale=2)
        out = _eval(node_cls(a, b))
        expected = np_fn(np.asarray(a.samples_), np.asarray(b.samples_))
        np.testing.assert_allclose(
            np.asarray(out, np.float64), np.asarray(expected, np.float64),
            rtol=2e-4, atol=1e-6,
        )


class TestVariadicTransforms:
    def _xyz(self):
        return (
            m.Distribution("uniform", loc=-1, scale=2),
            m.Distribution("uniform", loc=0, scale=3),
            m.Distribution("uniform", loc=-2, scale=1),
        )

    def test_add_multiply(self):
        x, y, z = self._xyz()
        out = _eval(m.Add(x, y, z))
        xs, ys, zs = _ref_inputs([x, y, z])
        np.testing.assert_allclose(out, xs + ys + zs, rtol=2e-4, atol=1e-6)
        out = _eval(m.Multiply(x, y, z))
        np.testing.assert_allclose(
            out, np.asarray(x.samples_) * np.asarray(y.samples_) * np.asarray(z.samples_),
            rtol=2e-4, atol=1e-6,
        )

    def test_max_min(self):
        x, y, z = self._xyz()
        out = _eval(m.Max(x, y, z))
        xs, ys, zs = _ref_inputs([x, y, z])
        np.testing.assert_allclose(out, np.maximum(np.maximum(xs, ys), zs), rtol=1e-5)
        out = _eval(m.Min(x, y, z))
        np.testing.assert_allclose(
            out,
            np.minimum(np.minimum(*_ref_inputs([x, y])), np.asarray(z.samples_)),
            rtol=1e-5,
        )

    def test_all_any(self):
        x, y = (m.Distribution("uniform") for _ in range(2))
        out = _eval(m.All(x > 0.3, y > 0.3))
        xs, ys = np.asarray(x.samples_), np.asarray(y.samples_)
        np.testing.assert_array_equal(np.asarray(out, bool), (xs > 0.3) & (ys > 0.3))
        out = _eval(m.Any(x > 0.7, y > 0.7))
        np.testing.assert_array_equal(np.asarray(out, bool), (xs > 0.7) | (ys > 0.7))

    def test_avg_non_associative_form(self):
        # Avg averages ALL args (not a pairwise reduce): Avg(a,b,c) == mean.
        x, y, z = self._xyz()
        out = _eval(m.Avg(x, y, z))
        xs, ys, zs = _ref_inputs([x, y, z])
        np.testing.assert_allclose(out, (xs + ys + zs) / 3, rtol=2e-4, atol=1e-6)

    def test_noop_value_is_none(self):
        x = m.Distribution("uniform")
        sink = m.NoOp(x)
        result = sink.sample(16, random_state=0)
        assert result is None
        assert sink.samples_ is None
        assert np.asarray(x.samples_).shape == (16,)
