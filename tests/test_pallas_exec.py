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

    def test_correlated_graph_supported(self):
        a, b = Distribution("norm"), Distribution("norm")
        sink = (a + b).correlate(a, b, corr_mat=np.eye(2))
        plan = _plan(sink)
        assert pallas_exec.supports(plan, frozenset({sink._id}))

    def test_too_many_correlated_vars_rejected(self):
        k = pallas_exec._MAX_CORR_K + 1
        ds = [Distribution("norm") for _ in range(k)]
        sink = ds[0]
        for d in ds[1:]:
            sink = sink + d
        sink.correlate(*ds, corr_mat=np.eye(k))
        assert not pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_correlated_ineligible_family_rejected(self):
        # A correlated variable outside the family whitelist disqualifies
        # the graph through the ordinary per-node gate.
        a = Distribution("norm")
        b = Distribution("poisson", mu=5000)  # table far beyond the cap
        sink = (a + b).correlate(a, b, corr_mat=np.eye(2))
        assert not pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_keep_all_small_graph_now_supported(self):
        # Round 3: narrow keep-lists (<= 16 nodes) ride the megakernel;
        # on a tiny graph "all nodes" is itself narrow.  The
        # keep-everything DEFAULT (gc_strategy=None) still routes to the
        # XLA path at the sampler level (keep_ids is None there).
        sink = Distribution("norm") + 1
        plan = _plan(sink)
        all_ids = frozenset(n._id for n in plan.topo)
        assert pallas_exec.supports(plan, all_ids)

    def test_unsupported_family_rejected(self):
        # A continuous family with no native kernel (host-callback only):
        # no whitelist entry, no incomplete-function cap, no CDF table.
        sink = Distribution("skewnorm", a=2.0) + 0
        assert not pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_newton_family_rejected(self):
        # Native XLA kernel exists (round-3 safeguarded Newton) but the
        # body is excluded from the Mosaic whitelist on purpose.
        sink = Distribution("exponnorm", K=1.5) + 0
        assert not pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_round3_closed_form_family_supported(self):
        sink = Distribution("burr", c=2.0, d=1.5) + 0
        assert pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_generic_discrete_table_family_supported(self):
        # hypergeom has no hand-written kernel but a small static CDF
        # table via the generic builder - megakernel-eligible.
        sink = Distribution("hypergeom", M=20, n=7, N=12) + 0
        assert pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_string_discrete_node_not_supported(self):
        sink = DiscreteDistribution(["a", "b", "c"]) + 0
        assert not pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_scalar_transform_not_supported(self):
        @scalar_transform
        def f(a):
            return a * 2

        sink = f(Distribution("norm"))
        assert not pallas_exec.supports(_plan(sink), frozenset({sink._id}))

    def test_small_numeric_tables_supported(self):
        from probabilit_tpu.modeling import (
            CumulativeDistribution,
            EmpiricalDistribution,
        )

        rng = np.random.default_rng(0)
        for node in (
            DiscreteDistribution([1, 2, 5], [0.2, 0.5, 0.3]),
            CumulativeDistribution([0.0, 0.5, 1.0], [10.0, 20.0, 40.0]),
            EmpiricalDistribution(rng.normal(size=50)),
        ):
            sink = node + 0
            assert pallas_exec.supports(_plan(sink), frozenset({sink._id})), node

    def test_static_discrete_table_families_supported(self):
        for sink in (
            Distribution("poisson", mu=3) + 0,
            Distribution("binom", n=8, p=0.4) + 0,
            Distribution("nbinom", n=5, p=0.5) + 0,
        ):
            assert pallas_exec.supports(_plan(sink), frozenset({sink._id})), sink

    def test_composite_or_huge_discrete_rejected(self):
        comp = Distribution("binom", n=Distribution("poisson", mu=3), p=0.4)
        assert not pallas_exec.supports(_plan(comp), frozenset({comp._id}))
        huge = Distribution("poisson", mu=5000) + 0  # reachable knots: 744 > 512
        assert not pallas_exec.supports(_plan(huge), frozenset({huge._id}))

    def test_narrow_keep_sets_supported(self):
        # Multi-output megakernel (round 3): a keep-list of up to 16
        # nodes rides the fast path; keep-everything and foreign nodes
        # do not.
        a = Distribution("norm")
        b = Distribution("uniform")
        sink = a * b + 1
        plan = _plan(sink)
        assert pallas_exec.supports(plan, frozenset({sink._id}))
        assert pallas_exec.supports(plan, frozenset({sink._id, a._id, b._id}))
        # sink must be kept
        assert not pallas_exec.supports(plan, frozenset({a._id}))
        # foreign node ids are rejected
        assert not pallas_exec.supports(plan, frozenset({sink._id, 10**9}))

    def test_wide_keep_set_rejected(self):
        total = Distribution("norm")
        keep = [total]
        for _ in range(17):
            total = total + Distribution("norm")
            keep.append(total)
        plan = _plan(total)
        keep_ids = frozenset(n._id for n in keep)
        assert len(keep_ids) > 16
        assert not pallas_exec.supports(plan, keep_ids)

    def test_mid_size_tables_supported(self):
        # The select-tree table kernels raised the cap from 64 to 512
        # knots: poisson mu=400 (510-entry trimmed table), binom n=200,
        # and 512-knot user tables are all on the fastest path now.
        from probabilit_tpu.modeling import EmpiricalDistribution

        rng = np.random.default_rng(0)
        for sink in (
            Distribution("poisson", mu=400) + 0,
            Distribution("poisson", mu=2000) + 0,  # 471 reachable knots
            Distribution("binom", n=200, p=0.5) + 0,
            Distribution("binom", n=5000, p=0.5) + 0,
            DiscreteDistribution(
                np.arange(512.0), rng.dirichlet(np.ones(512))
            )
            + 0,
            EmpiricalDistribution(rng.normal(size=512)) + 0,
        ):
            assert pallas_exec.supports(_plan(sink), frozenset({sink._id})), sink

    def test_large_or_string_tables_rejected(self):
        from probabilit_tpu.modeling import EmpiricalDistribution

        big = EmpiricalDistribution(np.arange(1000.0)) + 0
        assert not pallas_exec.supports(_plan(big), frozenset({big._id}))
        strings = DiscreteDistribution(["a", "b"]) + 0
        assert not pallas_exec.supports(_plan(strings), frozenset({strings._id}))
        exact = EmpiricalDistribution([1.0, 2.0], method="closest_observation") + 0
        assert not pallas_exec.supports(_plan(exact), frozenset({exact._id}))


class TestKernelTableHelpers:
    """The select-chain table kernels are pure jnp: exact-checkable on CPU."""

    def test_interp_matches_jnp(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        xp = np.sort(rng.uniform(0, 1, size=17))
        fp = rng.normal(size=17)
        q = jnp.asarray(
            rng.uniform(-0.1, 1.1, size=512).astype(np.float32).reshape(4, 128)
        )
        got = np.asarray(pallas_exec._kernel_interp(q, xp, fp))
        want = np.asarray(jnp.interp(q, jnp.asarray(xp, jnp.float32), jnp.asarray(fp, jnp.float32)))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_table_ppf_matches_searchsorted_left(self):
        import jax.numpy as jnp

        node = Distribution("poisson", mu=3)
        table, loc = pallas_exec._trimmed_cdf_table(node)
        rng = np.random.default_rng(3)
        q = rng.uniform(2.0**-24, 1 - 2.0**-24, size=4096).astype(np.float32)
        q[: len(table)] = table  # exact boundary hits: strict-side check
        got = np.asarray(pallas_exec._kernel_table_ppf(jnp.asarray(q), table, loc))
        k = np.minimum(
            np.searchsorted(table, q, side="left"), len(table) - 1
        ).astype(np.float32)
        np.testing.assert_array_equal(got, k + loc)

    def test_discrete_matches_searchsorted(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        p = rng.dirichlet(np.ones(9))
        values = rng.integers(-50, 50, size=9).astype(np.float64)
        cumulative = np.cumsum(p)
        q = rng.uniform(0, 1, size=4096).astype(np.float32)
        # Include exact threshold hits (QMC lattices can produce them).
        q[:9] = cumulative.astype(np.float32)
        got = np.asarray(pallas_exec._kernel_discrete(jnp.asarray(q), cumulative, values))
        idx = np.minimum(
            np.searchsorted(cumulative.astype(np.float32), q, side="right"),
            len(values) - 1,
        )
        np.testing.assert_array_equal(got, values[idx].astype(np.float32))


class TestSelectTreeLargeTables:
    """512-knot select trees: exact-checkable on CPU (pure jnp)."""

    def test_table_ppf_471_knots_matches_searchsorted(self):
        import jax.numpy as jnp

        node = Distribution("poisson", mu=2000)
        table, loc = pallas_exec._trimmed_cdf_table(node)
        assert 256 < len(table) <= 512
        assert loc > 0 and float(table[0]) >= 2.0**-24  # leading trim folded in
        rng = np.random.default_rng(9)
        q = rng.uniform(2.0**-24, 1 - 2.0**-24, size=8192).astype(np.float32)
        q[: len(table)] = table  # exact boundary hits: strict-side check
        got = np.asarray(pallas_exec._kernel_table_ppf(jnp.asarray(q), table, loc))
        k = np.minimum(
            np.searchsorted(table, q, side="left"), len(table) - 1
        ).astype(np.float32)
        np.testing.assert_array_equal(got, k + loc)

    def test_discrete_512_values_matches_searchsorted(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(10)
        p = rng.dirichlet(np.ones(512))
        values = rng.normal(size=512)
        cumulative = np.cumsum(p)
        q = rng.uniform(0, 1, size=8192).astype(np.float32)
        q[:512] = cumulative.astype(np.float32)
        got = np.asarray(
            pallas_exec._kernel_discrete(jnp.asarray(q), cumulative, values)
        )
        idx = np.minimum(
            np.searchsorted(cumulative.astype(np.float32), q, side="right"),
            len(values) - 1,
        )
        np.testing.assert_array_equal(got, values[idx].astype(np.float32))

    def test_interp_512_knots_matches_jnp(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(11)
        xp = np.sort(rng.uniform(0, 1, size=512))
        fp = rng.normal(size=512)
        q = jnp.asarray(
            rng.uniform(-0.05, 1.05, size=8192).astype(np.float32)
        )
        got = np.asarray(pallas_exec._kernel_interp(q, xp, fp))
        want = np.asarray(
            jnp.interp(q, jnp.asarray(xp, jnp.float32), jnp.asarray(fp, jnp.float32))
        )
        # Dense random knots (spacing ~0.002, slopes ~500): the kernel's
        # host-f64 precomputed slope and jnp.interp's on-device f32
        # divide round differently; agreement is to ~slope*ulp(x).
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_interp_duplicate_knots(self):
        # Duplicate knots: right-hand value at/past the jump, exactly as
        # the chain form behaved (covered separately since the tree
        # collapses equal boundaries structurally differently).
        import jax.numpy as jnp

        xp = np.array([0.0, 0.25, 0.25, 1.0])
        fp = np.array([0.0, 1.0, 5.0, 6.0])
        q = jnp.asarray(np.array([0.1, 0.25, 0.26, 0.9999, 1.0], np.float32))
        got = np.asarray(pallas_exec._kernel_interp(q, xp, fp))
        want = np.asarray(
            jnp.interp(
                jnp.asarray(q), jnp.asarray(xp, jnp.float32), jnp.asarray(fp, jnp.float32)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_single_entry_tables(self):
        import jax.numpy as jnp

        q = jnp.asarray(np.array([0.2, 0.8], np.float32))
        got = np.asarray(pallas_exec._kernel_discrete(q, np.array([1.0]), [7.0]))
        np.testing.assert_array_equal(got, [7.0, 7.0])
        got = np.asarray(
            pallas_exec._kernel_table_ppf(q, np.array([1.0]), 3.0)
        )
        np.testing.assert_array_equal(got, [3.0, 3.0])


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
        sink = Distribution("poisson", mu=5000) + 0
        with pytest.raises(ValueError, match="pallas"):
            sink.sample(64, random_state=0, gc_strategy=[], executor="pallas")

    def test_correlated_rejects_other_correlators(self):
        a, b = Distribution("norm"), Distribution("norm")
        sink = (a + b).correlate(a, b, corr_mat=np.eye(2))
        with pytest.raises(ValueError, match="imanconover"):
            sink.sample(
                64,
                random_state=0,
                gc_strategy=[],
                executor="pallas",
                correlator="cholesky",
            )

    @pytest.mark.skipif(not on_tpu, reason="megakernel runs on TPU only")
    def test_nonfinite_uncorrelated_raises(self):
        # Log of a normal NaNs on every negative draw; the pallas path
        # must enforce the same non-finite contract as the default
        # executor on UNCORRELATED graphs too (fused in-program flag).
        from probabilit_tpu.modeling import Log

        sink = Log(Distribution("norm", loc=0, scale=1))
        with pytest.raises(ValueError, match="non-finite"):
            sink.sample(4096, random_state=0, gc_strategy=[], executor="pallas")

    @pytest.mark.skipif(on_tpu, reason="checks the CPU refusal path")
    def test_requires_tpu_platform(self):
        # Library-level pre-check: an otherwise-eligible graph on a
        # non-TPU backend must get our error, not Mosaic's "Only
        # interpret mode is supported on CPU backend".
        sink = Distribution("norm") + 1
        with pytest.raises(ValueError, match="TPU backend"):
            sink.sample(64, random_state=0, gc_strategy=[], executor="pallas")

    @pytest.mark.skipif(on_tpu, reason="checks the CPU refusal path")
    def test_streaming_forced_pallas_names_environment_blocker(self):
        # sample_streaming must name the ACTUAL blocker: an eligible
        # graph blocked by the platform gets the environment message,
        # not "Graph not eligible" (review r3).
        from probabilit_tpu.engine import streaming

        sink = Distribution("norm") + 1
        with pytest.raises(ValueError, match="TPU backend"):
            streaming.sample_streaming(
                sink, 256, block_size=128, executor="pallas"
            )

    def test_failed_call_clears_stale_samples(self, monkeypatch):
        # A previous successful run's samples_ must not survive a failed
        # pallas call (ADVICE r2): the clearing loop runs before fn(seed).
        import probabilit_tpu.engine.sampler as sampler_mod

        sink = Distribution("norm") + 1
        sink.sample(64, random_state=0)
        assert hasattr(sink, "samples_")

        fake_dev = type("Dev", (), {"platform": "tpu"})()
        monkeypatch.setattr(sampler_mod.jax, "devices", lambda: [fake_dev])

        def boom(plan, size, keep_ids=None):
            raise RuntimeError("compile failed")

        monkeypatch.setattr(sampler_mod, "_get_pallas_fn", boom)
        with pytest.raises(RuntimeError, match="compile failed"):
            sink.sample(64, random_state=0, gc_strategy=[], executor="pallas")
        assert not hasattr(sink, "samples_")


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

    def test_correlated_statistics(self):
        # Two unit normals at corr 0.6: normal marginals make the score
        # correlation equal the Pearson correlation, so Var(a+b) = 3.2
        # exactly (the empirical-decorrelation step pins the sample
        # correlation to the target up to the CDF-roundtrip polynomials).
        a, b = Distribution("norm"), Distribution("norm")
        sink = (a + b).correlate(a, b, corr_mat=np.array([[1, 0.6], [0.6, 1]]))
        s = np.asarray(
            sink.sample(1_000_000, random_state=3, gc_strategy=[], executor="pallas")
        )
        assert np.isclose(s.std(), np.sqrt(3.2), atol=0.01)
        assert np.isclose(s.mean(), 0.0, atol=0.01)
        # Determinism per seed.
        s2 = np.asarray(
            sink.sample(1_000_000, random_state=3, gc_strategy=[], executor="pallas")
        )
        np.testing.assert_array_equal(s, s2)

    def test_correlated_marginal_preserved(self):
        import scipy.stats

        e = Distribution("expon", scale=2.0)
        x = Distribution("norm")
        sink = e + x * 0.0
        sink.correlate(e, x, corr_mat=np.array([[1, 0.5], [0.5, 1]]))
        s = np.asarray(
            sink.sample(300_000, random_state=11, gc_strategy=[], executor="pallas")
        )
        ks = scipy.stats.kstest(s, scipy.stats.expon(scale=2.0).cdf)
        assert ks.pvalue > 0.001

    def test_correlated_partial_tail_block(self):
        # A non-multiple-of-65536 size exercises the stats-pass masking of
        # the padded tail; the moments must cover exactly n samples.
        a, b = Distribution("norm"), Distribution("norm")
        sink = (a + b).correlate(a, b, corr_mat=np.array([[1, -0.7], [-0.7, 1]]))
        n = 200_001
        s = np.asarray(
            sink.sample(n, random_state=5, gc_strategy=[], executor="pallas")
        )
        assert s.shape == (n,)
        assert np.isclose(s.std(), np.sqrt(0.6), atol=0.02)

    def test_discrete_table_families_on_chip(self):
        import scipy.stats

        d = Distribution("poisson", mu=3)
        s = np.asarray(
            (d + 0.0).sample(200_000, random_state=6, gc_strategy=[], executor="pallas")
        )
        ref = scipy.stats.poisson(3)
        for k in range(8):
            assert abs(np.mean(s == k) - ref.pmf(k)) < 0.005, k
        b = Distribution("binom", n=10, p=0.3)
        sb = np.asarray(
            (b + 0.0).sample(200_000, random_state=8, gc_strategy=[], executor="pallas")
        )
        assert abs(sb.mean() - 3.0) < 0.02
        assert abs(sb.var() - 2.1) < 0.03

    def test_table_families_on_chip(self):
        import scipy.stats

        from probabilit_tpu.modeling import EmpiricalDistribution

        d = DiscreteDistribution([1.0, 2.0, 5.0], [0.2, 0.5, 0.3])
        s = np.asarray(
            (d + 0.0).sample(200_000, random_state=2, gc_strategy=[], executor="pallas")
        )
        counts = {v: float(np.mean(s == v)) for v in (1.0, 2.0, 5.0)}
        assert abs(counts[1.0] - 0.2) < 0.01
        assert abs(counts[2.0] - 0.5) < 0.01
        assert abs(counts[5.0] - 0.3) < 0.01

        rng = np.random.default_rng(5)
        data = rng.normal(loc=3.0, size=60)
        e = EmpiricalDistribution(data) + 0.0
        se = np.asarray(
            e.sample(100_000, random_state=4, gc_strategy=[], executor="pallas")
        )
        # Linear-interp empirical sampling stays within the data range and
        # reproduces its quartiles.
        assert se.min() >= data.min() and se.max() <= data.max()
        assert abs(np.median(se) - np.median(data)) < 0.05

    def test_multi_output_keep_list(self):
        # gc_strategy=[a, b]: kept intermediates come from the SAME
        # kernel instance as the sink, so the algebra must hold exactly.
        a = Distribution("norm", loc=2.0)
        b = Distribution("uniform")
        sink = a * b + 1
        out = np.asarray(
            sink.sample(
                200_000, random_state=5, gc_strategy=[a, b], executor="pallas"
            )
        )
        sa = np.asarray(a.samples_)
        sb = np.asarray(b.samples_)
        np.testing.assert_allclose(out, sa * sb + 1, rtol=1e-6, atol=1e-6)
        assert np.isclose(sa.mean(), 2.0, atol=0.02)
        assert np.isclose(sb.mean(), 0.5, atol=0.01)
        # Determinism with a keep-list.
        out2 = np.asarray(
            sink.sample(
                200_000, random_state=5, gc_strategy=[a, b], executor="pallas"
            )
        )
        np.testing.assert_array_equal(out, out2)

    def test_large_table_families_on_chip(self):
        # 512-cap select trees on the real chip: poisson mu=400 (510-knot
        # trimmed table) through the megakernel vs scipy and vs the XLA
        # executor (different streams, same distribution).
        import scipy.stats

        d = Distribution("poisson", mu=400) + 0.0
        n = 200_000
        pal = np.asarray(
            d.sample(n, random_state=6, gc_strategy=[], executor="pallas")
        )
        ref = scipy.stats.poisson(400)
        assert abs(pal.mean() - 400.0) < 0.3
        assert abs(pal.var() - 400.0) / 400.0 < 0.02
        ks = scipy.stats.kstest(pal, lambda x: ref.cdf(np.floor(x)))
        assert ks.pvalue > 1e-4 or abs(pal.mean() - 400.0) < 0.2
        xla = np.asarray(d.sample(n, random_state=6, gc_strategy=[]))
        for q in (0.05, 0.5, 0.95):
            assert abs(np.quantile(pal, q) - np.quantile(xla, q)) <= 2.0, q

    def test_correlated_executors_agree_in_distribution(self):
        # Different streams (threefry vs hardware PRNG) but the same
        # model must produce the same distribution through both
        # executors: compare moments of the 50-node correlated DAG.
        from probabilit_tpu.models import benchmarks

        n = 1_000_000
        sink = benchmarks.mixed_correlated_50()
        xla = np.asarray(sink.sample(n, random_state=3, gc_strategy=[]))
        pal = np.asarray(
            sink.sample(n, random_state=3, gc_strategy=[], executor="pallas")
        )
        assert np.isclose(xla.mean(), pal.mean(), rtol=0.01)
        assert np.isclose(xla.std(), pal.std(), rtol=0.02)
        for q in (0.05, 0.5, 0.95):
            assert np.isclose(
                np.quantile(xla, q), np.quantile(pal, q), rtol=0.02, atol=0.05
            ), q

    def test_adjacent_seeds_not_block_permutations(self):
        # Regression: seeding the kernel PRNG with ``word0 ^ block_id``
        # makes seeds s and s' emit the SAME multiset of 64k-sample block
        # streams whenever {s ^ b} == {s' ^ b} (true for any even block
        # count with adjacent seeds) — identical sorted samples, merely
        # block-permuted.  The murmur-mixed seeding must break this.
        sink = Distribution("norm")
        n = 262_144  # 4 blocks of 65,536
        a = np.sort(
            np.asarray(sink.sample(n, random_state=0, gc_strategy=[], executor="pallas"))
        )
        b = np.sort(
            np.asarray(sink.sample(n, random_state=1, gc_strategy=[], executor="pallas"))
        )
        assert not np.array_equal(a, b)


class TestIncompleteFunctionFamilies:
    """gamma/beta-family eligibility gating + (on TPU) KS correctness."""

    def test_static_params_in_range_supported(self):
        for name, kw in [
            ("gamma", dict(a=2.5)),
            ("beta", dict(a=2.0, b=5.0)),
            ("t", dict(df=7)),
            ("chi2", dict(df=4)),
            ("f", dict(dfn=5, dfd=9)),
            ("invgamma", dict(a=3.0)),
            ("nakagami", dict(nu=1.5)),
            ("maxwell", dict()),
        ]:
            sink = Distribution(name, **kw)
            assert pallas_exec.supports(_plan(sink), frozenset({sink._id})), name

    def test_out_of_range_or_composite_rejected(self):
        big = Distribution("gamma", a=100.0)
        assert not pallas_exec.supports(_plan(big), frozenset({big._id}))
        comp = Distribution("gamma", a=Distribution("uniform", loc=1, scale=1))
        assert not pallas_exec.supports(_plan(comp), frozenset({comp._id}))

    @pytest.mark.skipif(not on_tpu, reason="hardware PRNG requires TPU")
    @pytest.mark.parametrize(
        "name,kw",
        [
            ("gamma", dict(a=2.5)),
            ("beta", dict(a=2.0, b=5.0)),
            ("t", dict(df=7)),
            ("f", dict(dfn=5, dfd=9)),
        ],
    )
    def test_ks_against_scipy(self, name, kw):
        import scipy.stats

        d = Distribution(name, **kw)
        s = np.asarray(
            d.sample(100_000, random_state=3, gc_strategy=[], executor="pallas")
        )
        ref = getattr(scipy.stats, name)(**kw)
        assert scipy.stats.kstest(s, ref.cdf).pvalue > 0.001
