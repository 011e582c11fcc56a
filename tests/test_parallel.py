"""Same-program-different-mesh tests (SURVEY §4's added tier).

Runs on the 8 virtual CPU devices from conftest: results must be invariant
to the mesh shape (counter-based RNG + sharding-annotation-only layout),
and the full sampling step — including Iman-Conover collectives — must
compile and execute under every mesh size.
"""

import jax
import numpy as np
import pytest

from probabilit_tpu.modeling import Distribution, Exp
from probabilit_tpu.parallel import make_mesh, sample_sharding, use_mesh

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_devices
class TestMeshInvariance:
    @pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
    def test_identical_results_any_mesh(self, n_dev):
        expr = Distribution("norm", loc=1, scale=2) * Exp(Distribution("expon"))
        baseline = np.asarray(expr.sample(4096, random_state=3))
        with use_mesh(make_mesh(jax.devices()[:n_dev])):
            sharded = np.asarray(expr.sample(4096, random_state=3))
        np.testing.assert_array_equal(baseline, sharded)

    def test_quantile_matrix_is_sharded(self):
        with use_mesh(make_mesh()):
            sharding = sample_sharding(ndim=2)
            assert sharding is not None
            x = jax.device_put(np.zeros((64, 2), np.float32), sharding)
            # Samples axis split over all 8 devices
            assert len({d for d in x.sharding.device_set}) == 8

    def test_shard_samples_scalar_is_noop(self):
        # 0-d values have no sample axis; placement must be left alone
        # instead of crashing on a one-axis PartitionSpec.
        from probabilit_tpu.parallel import shard_samples

        with use_mesh(make_mesh()):
            out = shard_samples(np.float32(1.5))
        assert float(np.asarray(out)) == 1.5

    def test_correlated_sampling_under_mesh(self):
        a, b = Distribution("uniform"), Distribution("expon")
        corr = np.array([[1, 0.6], [0.6, 1]])
        expr = (a + b).correlate(a, b, corr_mat=corr)
        with use_mesh(make_mesh()):
            expr.sample(4096, random_state=0)
            achieved = np.corrcoef(
                np.asarray(a.samples_), np.asarray(b.samples_)
            )[0, 1]
        assert np.isclose(achieved, 0.6, atol=0.1)

    def test_correlated_mesh_matches_unsharded_closely(self):
        # Contract: the UNCORRELATED path is bitwise mesh-invariant
        # (test_identical_results_any_mesh); the correlated path computes
        # its values (generated 2-sort variant), so sharded reduction
        # order may drift the result at the 1e-4 level — but no further,
        # and never by a rank swap (which would show up as O(1) diffs).
        a, b = Distribution("norm"), Distribution("norm")
        corr = np.array([[1, 0.7], [0.7, 1]])
        expr = (a + b).correlate(a, b, corr_mat=corr)
        base = np.asarray(expr.sample(4096, random_state=7))
        with use_mesh(make_mesh()):
            sharded = np.asarray(expr.sample(4096, random_state=7))
        np.testing.assert_allclose(base, sharded, rtol=1e-3, atol=1e-3)

    def test_streaming_under_mesh(self):
        from probabilit_tpu.engine import streaming

        model = Distribution("norm", loc=4)
        with use_mesh(make_mesh()):
            stats = streaming.estimate(model, 100_000, block_size=8192, random_state=0)
        assert np.isclose(stats["mean"], 4.0, atol=0.05)


@needs_devices
class TestGraftEntryPoints:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import entry

        fn, args = entry()
        out = np.asarray(jax.jit(fn)(*args))
        assert out.shape == (8192,)
        assert np.isfinite(out).all()

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)


@needs_devices
class TestColumnShardedImanConover:
    """User-facing IC shards statistical columns over the mesh: rows are
    independent through all four sorts, so N chips divide the sort cost by
    N (BASELINE.md roofline analysis); only the KxK Gram induces
    collectives."""

    def test_matches_unsharded_divisible(self):
        from probabilit_tpu.ops.correlation import ImanConover
        from probabilit_tpu.parallel import make_mesh, use_mesh

        rng = np.random.default_rng(1)
        X = rng.normal(size=(2000, 16))
        C = np.eye(16) * 0.7 + 0.3
        ic = ImanConover().set_target(C)
        base = np.asarray(ic(X))
        with use_mesh(make_mesh()):
            sharded = np.asarray(ic(X))
        # 16 rows over 8 devices: no padding, layout-identical matmuls.
        np.testing.assert_array_equal(base, sharded)

    def test_matches_unsharded_padded(self):
        from probabilit_tpu.ops.correlation import ImanConover
        from probabilit_tpu.parallel import make_mesh, use_mesh

        rng = np.random.default_rng(2)
        X = rng.normal(size=(1500, 5))
        C = np.eye(5) * 0.5 + 0.5
        ic = ImanConover().set_target(C)
        base = np.asarray(ic(X))
        with use_mesh(make_mesh()):
            sharded = np.asarray(ic(X))
        # Padding rows change Gram blocking: reduction-order noise only.
        np.testing.assert_allclose(base, sharded, rtol=1e-4, atol=1e-5)
        for k in range(5):
            np.testing.assert_array_equal(
                np.sort(sharded[:, k]), np.sort(X[:, k].astype(np.float32))
            )


class TestDeepGraphCompile:
    def test_4000_node_chain_compiles_quickly(self):
        # Round-1 noted a compile cliff at ~4,500-node chains; after
        # topo-ordered emission a 12,002-node chain compiles+runs in ~6 s
        # on CPU. Regression-bound it generously.
        import time

        from probabilit_tpu.modeling import Constant, Distribution

        total = Constant(0)
        rate = Distribution("norm", loc=1.001, scale=0.001)
        for _ in range(1333):  # 4,001 nodes
            total = total * rate + 100
        t0 = time.perf_counter()
        out = np.asarray(total.sample(128, random_state=0, gc_strategy=[]))
        assert np.isfinite(out).all()
        assert time.perf_counter() - t0 < 120

    def test_steady_state_call_overhead_bounded(self):
        # The Plan (topo sort, column map, signature) is cached on the
        # sink across sample() calls, so the per-call Python cost at deep
        # scale is the executor dispatch, not O(graph) re-analysis
        # (VERDICT r2 weak #5).  Assert the plan object is reused and
        # that 10 cached calls cost well under one cold build+compile.
        import time

        from probabilit_tpu.engine import compile as _compile
        from probabilit_tpu.modeling import Constant, Distribution

        total = Constant(0)
        rate = Distribution("norm", loc=1.001, scale=0.001)
        for _ in range(1000):  # 3,001 nodes
            total = total * rate + 100

        t0 = time.perf_counter()
        total.sample(128, random_state=0, gc_strategy=[])
        cold = time.perf_counter() - t0

        plan = _compile.get_plan(total)
        assert _compile.get_plan(total) is plan  # cache hit
        t0 = time.perf_counter()
        for seed in range(10):
            total.sample(128, random_state=seed, gc_strategy=[])
        warm10 = time.perf_counter() - t0
        assert _compile.get_plan(total) is plan
        assert warm10 < max(2.0, cold)  # 10 warm calls < one cold call

    def test_plan_cache_invalidation(self):
        import numpy as np

        from probabilit_tpu.engine import compile as _compile
        from probabilit_tpu.modeling import Distribution

        a = Distribution("norm")
        b = Distribution("norm")
        sink = a + b
        plan = _compile.get_plan(sink)
        assert _compile.get_plan(sink) is plan
        assert plan.corr_matrix is None

        # correlate() on an ancestor must invalidate the cached plan.
        sink.correlate(a, b, corr_mat=np.array([[1.0, 0.6], [0.6, 1.0]]))
        plan2 = _compile.get_plan(sink)
        assert plan2 is not plan
        assert plan2.corr_matrix is not None

        # A copied graph shares _ids but must not share the cached plan:
        # its topo has to point at the COPIED nodes.
        sink3 = sink.copy()
        plan3 = _compile.get_plan(sink3)
        assert plan3 is not plan2
        assert plan3.sink is sink3 and plan3.sink is not sink
        assert all(n is not o for n, o in zip(plan3.topo, plan2.topo))

    def test_deep_repr_terminates(self):
        from probabilit_tpu.modeling import Constant, Distribution

        total = Constant(0)
        rate = Distribution("norm", loc=1.001, scale=0.001)
        for _ in range(2000):
            total = total * rate + 100
        r = repr(total)
        assert r.endswith(")") and "..." in r and len(r) < 100_000
