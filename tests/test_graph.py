"""Graph-structure tests: nodes, transforms, copying, tree printing.

Modeled on the reference's structural tests (tests/test_modeling.py) and
module doctests (modeling.py:51-107).
"""

import numpy as np
import pytest

from probabilit_tpu.modeling import (
    Add,
    Abs,
    Constant,
    Distribution,
    Equal,
    Exp,
    NoOp,
    Power,
    Subtract,
    topological_sort,
)
from probabilit_tpu.inspection import treeprint


class TestGraphStructure:
    def test_constants_propagate(self):
        a = Constant(1)
        result = np.asarray((a * 3 + 5).sample(5, random_state=0))
        np.testing.assert_array_equal(result, [8, 8, 8, 8, 8])
        assert np.issubdtype(result.dtype, np.integer)

    def test_variadic_add(self):
        result = np.asarray(Add(10, 5, 5).sample(5, random_state=0))
        np.testing.assert_array_equal(result, [20, 20, 20, 20, 20])

    def test_nodes_enumeration(self):
        a = Distribution("norm", loc=5, scale=1)
        b = Distribution("expon", scale=1)
        expression = a**b + a * b + 5 * b
        unique = sorted(set(expression.nodes()), key=lambda n: n._id)
        # a, b, Power, Multiply, Add, Constant(5), Multiply, Add
        assert len(unique) == 8
        assert unique[0] is a
        assert unique[1] is b

    def test_repr_matches_reference_format(self):
        a = Distribution("norm", loc=5, scale=1)
        assert repr(a) == 'Distribution("norm", loc=5, scale=1)'
        expr = Distribution("norm") - 2 ** Constant(2)
        assert (
            repr(expr)
            == 'Subtract(Distribution("norm"), Power(Constant(2), Constant(2)))'
        )

    def test_equality_is_identity(self):
        a, b = Constant(1), Constant(1)
        assert a != b
        assert a == a
        assert len({a, b}) == 2

    def test_constant_idempotent_ctor(self):
        c = Constant(Constant(3))
        assert c.value == 3

    def test_topological_sort_parents_first(self):
        a = Distribution("norm")
        b = Exp(a)
        c = b + a
        order = topological_sort(c)
        assert order.index(a) < order.index(b) < order.index(c)

    def test_cycle_detection(self):
        a = Add(1, 2)
        b = Add(a, 3)
        a.parents = (b, a.parents[1])  # Build a cycle by hand
        with pytest.raises(ValueError, match="cycle"):
            topological_sort(b)

    def test_num_distribution_nodes(self):
        mu = Distribution("norm")
        composite = Distribution("norm", loc=mu, scale=1)
        expr = composite + mu - 2
        assert expr.num_distribution_nodes() == 2


class TestCopy:
    def test_copy_preserves_ids_and_structure(self):
        mu = Distribution("norm", loc=0, scale=1)
        a = Distribution("norm", loc=mu, scale=Constant(0.5))
        a2 = a.copy()
        assert a is not a2
        assert a2._id == a._id
        assert a2.kwargs["loc"] == a.kwargs["loc"]  # same _id
        assert a2.kwargs["loc"] is not a.kwargs["loc"]

    def test_copy_preserves_samples(self):
        a = Distribution("norm")
        expr = a + 1
        expr.sample(9, random_state=0)
        expr2 = expr.copy()
        np.testing.assert_allclose(
            np.asarray(expr.samples_), np.asarray(expr2.samples_)
        )
        # Copied samples are independent objects
        assert expr2.samples_ is not expr.samples_

    def test_copy_deepcopies_mutable_non_node_args(self):
        # Reference copy semantics (modeling.py:371-394): non-Node
        # arguments go through deepcopy, so a mutable arg must not stay
        # aliased between a graph and its copy (review r3).
        loc = np.array(1.5)  # 0-d array: a mutable non-Node argument
        d = Distribution("norm", loc=loc, scale=2.0)
        d2 = d.copy()
        assert d2.kwargs["loc"] is not d.kwargs["loc"]
        np.testing.assert_array_equal(d2.kwargs["loc"], d.kwargs["loc"])

    def test_copy_remaps_correlations(self):
        a, b = Distribution("uniform"), Distribution("uniform")
        expr = (a + b).correlate(a, b, corr_mat=np.eye(2))
        expr2 = expr.copy()
        (vars2, mat2) = expr2._correlations[0]
        parents2 = list(expr2.get_parents())
        assert vars2[0] is parents2[0]
        assert vars2[1] is parents2[1]

    def test_noop_copy_used_by_plot(self):
        a = Distribution("uniform")
        wrapped = NoOp(a).copy()
        assert wrapped.parents[0] is not a
        assert wrapped.parents[0]._id == a._id

    def test_plot_smoke_with_corr(self):
        # End-to-end seaborn path: scalar corr expands to a 2x2 target,
        # sampling happens on the detached copy, a PairGrid comes back.
        matplotlib = pytest.importorskip("matplotlib")
        matplotlib.use("Agg")
        seaborn = pytest.importorskip("seaborn")
        from probabilit_tpu.inspection import plot

        a = Distribution("uniform")
        b = Distribution("norm")
        grid = plot(a, b, corr=0.5, sample_kwargs={"size": 256})
        assert isinstance(grid, seaborn.axisgrid.PairGrid)
        # The caller's nodes were never sampled (detached copy only).
        assert not hasattr(a, "samples_") and not hasattr(b, "samples_")
        matplotlib.pyplot.close("all")


class TestTreeprint:
    def test_treeprint_output(self, capsys):
        scale = Distribution("expon")
        a = Distribution("norm", loc=1, scale=scale)
        treeprint(a + scale - scale**2)
        out = capsys.readouterr().out
        assert out.splitlines()[0] == "Subtract"
        assert 'Distribution("norm", loc=1, scale=Distribution("expon"))' in out
        assert "Constant(2)" in out

    def test_treeprint_deep_chain_no_recursion_error(self, capsys):
        # Chains deeper than Python's recursion limit are a supported
        # scale (12k-node compile regression test); the renderer must
        # not recurse (review r3).
        total = Distribution("norm")
        for _ in range(1500):
            total = total + 1.0
        treeprint(total)
        out = capsys.readouterr().out
        assert out.count("Add") == 1500


class TestSharedSubexpressionScaling:
    def test_correlate_on_shared_subexpression_graph(self):
        # x = x + x doubling 26 times shares every level; the reference's
        # path-multiplicity set(nodes()) yields 2^26+ nodes here and
        # effectively hangs at model-BUILD time (review r3).  unique_nodes
        # makes ancestry validation linear in the ~30 unique nodes.
        a, b = Distribution("norm"), Distribution("norm")
        x = a + b
        for _ in range(26):
            x = x + x
        x.correlate(a, b, corr_mat=np.eye(2))
        assert x.num_distribution_nodes() == 2
        assert a._is_initial_sampling_node()
        g = x.to_graph()
        assert g.number_of_nodes() == 26 + 3  # 26 Adds + root Add + a + b


class TestOverloads:
    def test_arithmetic_builds_expected_nodes(self):
        a = Constant(2)
        assert isinstance(a + 1, Add)
        assert isinstance(1 - a, Subtract)
        assert isinstance(a**2, Power)
        assert isinstance(abs(a), Abs)
        assert isinstance(Equal(a, a), Equal)

    def test_radd_rsub(self):
        a = Constant(3)
        assert float(np.asarray((10 - a).sample(1, random_state=0))[0]) == 7.0
        assert float(np.asarray((10 + a).sample(1, random_state=0))[0]) == 13.0
        assert float(np.asarray((2**a).sample(1, random_state=0))[0]) == 8.0
        assert float(np.asarray((12 / a).sample(1, random_state=0))[0]) == 4.0
        assert float(np.asarray((10 // a).sample(1, random_state=0))[0]) == 3.0
        assert float(np.asarray((10 % a).sample(1, random_state=0))[0]) == 1.0

    def test_python_numbers_to_constants(self):
        expr = Constant(1) + 2.5
        parents = list(expr.get_parents())
        assert isinstance(parents[1], Constant)
        assert parents[1].value == 2.5


class TestDeepGraphs:
    def test_deep_chain_traces_without_recursion_error(self):
        # ~1200-node chain (depth ~2x the default Python recursion limit
        # in emitter frames); the lazy-recursive emit used to raise
        # RecursionError at trace time with gc_strategy=[].
        total = Distribution("norm", loc=1.01, scale=0.01)
        for _ in range(400):
            total = total * 1.0001 + 0.5
        s = np.asarray(total.sample(8, random_state=0, gc_strategy=[]))
        assert np.isfinite(s).all()
