"""GarbageCollector class behavior and utils helpers.

Mirrors reference tests/test_garbage_collector.py and utils doctests.
"""

import itertools

import numpy as np
import pytest

from probabilit_tpu.garbage_collector import GarbageCollector
from probabilit_tpu.modeling import Constant, Distribution, Exp
from probabilit_tpu.utils import adjust_minmax_quantiles, build_corrmat, zip_args


class TestGarbageCollectorClass:
    """Host-side GC mechanism (the engine uses output selection instead)."""

    def _manual_sample(self, sink, gc):
        """Drive the GC through a manual topological pass."""
        from probabilit_tpu.models.graph import topological_sort

        gc.set_sink(sink)
        for node in topological_sort(sink):
            node.samples_ = np.zeros(3)
            gc.decrement_and_delete(node)

    def test_none_strategy_keeps_all(self):
        a = Distribution("norm")
        final = Exp((a + a) ** 2)
        self._manual_sample(final, GarbageCollector(strategy=None))
        for node in set(final.nodes()):
            assert hasattr(node, "samples_")

    def test_empty_strategy_frees_all_but_sink(self):
        a = Distribution("norm")
        inter = (a + a) ** 2
        final = Exp(inter)
        self._manual_sample(final, GarbageCollector(strategy=[]))
        assert not hasattr(a, "samples_")
        assert not hasattr(inter, "samples_")
        assert hasattr(final, "samples_")

    def test_protected_nodes_survive(self):
        a = Distribution("norm")
        inter = (a + a) ** 2
        final = Exp(inter)
        self._manual_sample(final, GarbageCollector(strategy=[inter]))
        assert not hasattr(a, "samples_")
        assert hasattr(inter, "samples_")
        assert hasattr(final, "samples_")

    def test_large_graph(self):
        # ~400-node graph, mirroring the reference's 99-year model test.
        total = Constant(0)
        rate = Distribution("norm", loc=1.01, scale=0.01)
        for _ in range(99):
            total = total * rate + 100
        self._manual_sample(total, GarbageCollector(strategy=[rate]))
        assert hasattr(rate, "samples_")
        assert hasattr(total, "samples_")
        n_with_samples = sum(
            1 for node in set(total.nodes()) if hasattr(node, "samples_")
        )
        assert n_with_samples == 2

    def test_census_matches_path_multiplicity_traversal(self):
        # The O(V+E) propagated census must equal the reference's
        # Counter over the duplicate-revisiting nodes() traversal.
        from collections import Counter

        a = Distribution("norm")
        b = a + a
        sink = b * b + a
        expected = Counter(p for node in sink.nodes() for p in node.get_parents())
        gc = GarbageCollector(strategy=[]).set_sink(sink)
        assert gc._edges_left == expected

    def test_deep_shared_chain_census_is_linear(self):
        # x = x + x nested 40 deep has 2^40 paths; the census must be
        # computed by multiplicity propagation, not traversal.
        import time

        x = Distribution("norm")
        for _ in range(40):
            x = x + x
        t0 = time.perf_counter()
        GarbageCollector(strategy=[]).set_sink(x)
        assert time.perf_counter() - t0 < 2.0

    def test_set_sink_required(self):
        gc = GarbageCollector(strategy=[])
        with pytest.raises(ValueError, match="set_sink"):
            gc.decrement_and_delete(Constant(1))

    def test_strategy_type_validation(self):
        with pytest.raises(TypeError):
            GarbageCollector(strategy=42)


class TestConfigDtype:
    def test_x64_flag_follows_dtype_both_ways(self):
        # Switching back to float32 must also disable jax_enable_x64, or
        # JAX default dtypes disagree with float_dtype()/int_dtype().
        import jax
        import jax.numpy as jnp

        from probabilit_tpu import config

        orig = config.float_dtype()
        try:
            config.set_dtype(jnp.float64)
            assert jax.config.read("jax_enable_x64")
            assert config.np_float_dtype() == np.dtype("float64")
            config.set_dtype(jnp.float32)
            assert not jax.config.read("jax_enable_x64")
            assert config.np_float_dtype() == np.dtype("float32")
            assert config.int_dtype() == jnp.int32
        finally:
            config.set_dtype(orig)


class TestBuildCorrmat:
    def test_scatter(self):
        correlations = [((0, 2), np.array([[1, 0.5], [0.5, 1]]))]
        C = build_corrmat(correlations)
        expected = np.array([[1, 0, 0.5], [0, 1, 0], [0.5, 0, 1.0]])
        np.testing.assert_allclose(C, expected)

    def test_multiple_blocks(self):
        c1 = ((0, 1), np.array([[1, 0.3], [0.3, 1]]))
        c2 = ((2, 3), np.array([[1, -0.2], [-0.2, 1]]))
        C = build_corrmat([c1, c2])
        assert C.shape == (4, 4)
        assert C[0, 1] == 0.3 and C[2, 3] == -0.2 and C[1, 2] == 0.0


class TestZipArgs:
    def test_zipping(self):
        args = ((1, 2, 3), itertools.repeat(None))
        kwargs = {"a": (5, 6, 7), "b": itertools.repeat(9)}
        out = list(zip_args(args, kwargs))
        assert out[0] == ((1, None), {"a": 5, "b": 9})
        assert out[2] == ((3, None), {"a": 7, "b": 9})

    def test_empty_args(self):
        out = list(itertools.islice(zip_args((), {"a": (1, 2)}), 2))
        assert out[0][1] == {"a": 1}

    def test_both_empty_terminates(self):
        # Zero argument streams = zero calls; the reference's version
        # yields ((), {}) forever here (review r3).
        assert list(zip_args((), {})) == []


class TestAdjustMinmaxQuantiles:
    def test_no_change_when_mean_matches(self):
        out = adjust_minmax_quantiles([0, 0.5, 1], [0, 5, 6], expected=4.0)
        np.testing.assert_allclose(out, [0.0, 5.0, 6.0], atol=1e-3)

    def test_moves_endpoints_to_hit_mean(self):
        out = adjust_minmax_quantiles([0, 0.5, 1], [0, 5, 6], expected=5.0)
        w = np.diff([0, 0.5, 1])
        mids = 0.5 * (out[:-1] + out[1:])
        assert np.isclose(np.sum(w * mids) / np.sum(w), 5.0, atol=1e-3)
