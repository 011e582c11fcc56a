"""Pallas megakernel executor: eligibility + error paths (CPU) and
statistical behavior (TPU only; the hardware PRNG has no faithful CPU
interpretation).
"""

import jax
import numpy as np
import pytest

from probabilit_tpu.engine import compile as _compile
from probabilit_tpu.engine import pallas_exec
from probabilit_tpu.modeling import (
    Constant,
    DiscreteDistribution,
    Distribution,
    Exp,
    scalar_transform,
)

on_tpu = jax.devices()[0].platform == "tpu"


def _plan(sink):
    return _compile.Plan(sink)


class TestEligibility:
    def test_arithmetic_graph_supported(self):
        sink = Distribution("norm") * Exp(Distribution("uniform")) + Constant(2)
        plan = _plan(sink)
        assert pallas_exec.supports(plan, frozenset({sink._id}))

    def test_flagship_supported(self):
        from probabilit_tpu.models.benchmarks import mixed_dag_20

        sink = mixed_dag_20()
        assert pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_correlations_not_supported(self):
        a, b = Distribution("norm"), Distribution("norm")
        sink = (a + b).correlate(a, b, corr_mat=np.eye(2))
        plan = _plan(sink)
        assert not pallas_exec.supports(plan, frozenset({sink._id}))

    def test_keep_all_not_supported(self):
        sink = Distribution("norm") + 1
        plan = _plan(sink)
        all_ids = frozenset(n._id for n in plan.topo)
        assert not pallas_exec.supports(plan, all_ids)

    def test_table_distribution_not_supported(self):
        sink = Distribution("poisson", mu=3) + 0
        assert not pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_discrete_node_not_supported(self):
        sink = DiscreteDistribution([1, 2, 3]) + 0
        assert not pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_scalar_transform_not_supported(self):
        @scalar_transform
        def f(a):
            return a * 2

        sink = f(Distribution("norm"))
        assert not pallas_exec.supports(_plan(sink), frozenset({sink._id}))


class TestErrorPaths:
    def test_requires_gc_sink_only(self):
        sink = Distribution("norm") + 1
        with pytest.raises(ValueError, match="pallas"):
            sink.sample(64, random_state=0, executor="pallas")  # gc=None

    def test_rejects_qmc_method(self):
        sink = Distribution("norm") + 1
        with pytest.raises(ValueError, match="pallas"):
            sink.sample(64, random_state=0, gc_strategy=[], method="sobol",
                        executor="pallas")

    def test_rejects_ineligible_graph(self):
        sink = Distribution("poisson", mu=3) + 0
        with pytest.raises(ValueError, match="pallas"):
            sink.sample(64, random_state=0, gc_strategy=[], executor="pallas")


@pytest.mark.skipif(not on_tpu, reason="hardware PRNG requires a real TPU")
class TestOnTpu:
    def test_statistics_and_determinism(self):
        sink = Distribution("norm", loc=3, scale=2) * Distribution("uniform") + 1
        s1 = np.asarray(
            sink.sample(200_000, random_state=7, gc_strategy=[], executor="pallas")
        )
        assert np.isfinite(s1).all()
        assert np.isclose(s1.mean(), 2.5, atol=0.05)  # E[N(3,2)*U(0,1)] + 1
        s2 = np.asarray(
            sink.sample(200_000, random_state=7, gc_strategy=[], executor="pallas")
        )
        np.testing.assert_array_equal(s1, s2)
        s3 = np.asarray(
            sink.sample(200_000, random_state=8, gc_strategy=[], executor="pallas")
        )
        assert not np.array_equal(s1, s3)
