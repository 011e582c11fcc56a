"""Stochastic-process nodes: exact grid distributions, functionals,
graph integration (framework extension; the reference has no processes).
"""

import numpy as np
import pytest
from scipy import stats

from probabilit_tpu import BrownianMotion, Distribution, GeometricBrownianMotion


class TestBrownianPath:
    def test_terminal_exact_normal(self):
        # Increments are exact Gaussians, so W_T ~ N(x0 + drift*T,
        # diffusion^2 * T) with no discretisation error.
        w = BrownianMotion(x0=1.0, drift=0.3, diffusion=1.5, T=2.0, steps=128)
        s = np.asarray(w.terminal().sample(30000, random_state=0))
        p = stats.kstest(s[:8000], "norm", args=(1.6, 1.5 * np.sqrt(2))).pvalue
        assert p > 0.01

    def test_slice_variance_scales_with_time(self):
        w = BrownianMotion(T=2.0, steps=128, diffusion=1.5)
        a = np.asarray(w.at(31).sample(30000, random_state=1))
        # at(31) is time 32*dt.
        assert a.var() == pytest.approx(1.5**2 * 32 * (2.0 / 128), abs=0.03)

    def test_max_bounds_and_reflection_direction(self):
        # Discrete-time max is below the continuous supremum, so the
        # reflection-principle value 2*P(W_T > a) upper-bounds it; it
        # still must dominate the one-sided terminal probability.
        w = BrownianMotion(T=1.0, steps=256)
        mx = np.asarray(w.maximum().sample(40000, random_state=2))
        p_hit = float(np.mean(mx > 1.0))
        upper = 2 * (1 - stats.norm.cdf(1.0))
        lower = 1 - stats.norm.cdf(1.0)
        assert lower < p_hit <= upper + 0.01

    def test_validation(self):
        with pytest.raises(ValueError, match="steps"):
            BrownianMotion(steps=0)
        with pytest.raises(ValueError, match="T must be positive"):
            BrownianMotion(T=0.0)
        with pytest.raises(ValueError, match="diffusion"):
            BrownianMotion(diffusion=0.0)
        w = BrownianMotion(steps=8)
        with pytest.raises(ValueError, match="step must be in"):
            w.at(8)


class TestGBMPath:
    def test_terminal_exact_lognormal(self):
        # log S_T is a Brownian cumulative sum: exactly N((mu-s^2/2)T, s^2 T).
        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, T=1.0, steps=64)
        st = np.asarray(g.terminal().sample(30000, random_state=2))
        p = stats.kstest(np.log(st[:8000] / 100), "norm", args=(0.03, 0.2)).pvalue
        assert p > 0.01
        assert st.mean() == pytest.approx(100 * np.exp(0.05), abs=0.6)

    def test_validation(self):
        with pytest.raises(ValueError, match="s0"):
            GeometricBrownianMotion(s0=0.0)
        with pytest.raises(ValueError, match="sigma"):
            GeometricBrownianMotion(sigma=-1.0)


class TestFunctionals:
    def test_memoised_and_ordered(self):
        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, steps=32)
        assert g.terminal() is g.terminal()
        assert g.at(3) is g.at(3) and g.at(3) is not g.at(4)
        payoff = (g.maximum() < 130) * (g.terminal() - 100)
        payoff.sample(20000, random_state=4)
        mx = np.asarray(g.maximum().samples_)
        mn = np.asarray(g.minimum().sample(20000, random_state=4))
        tm = np.asarray(g.terminal().samples_)
        av = np.asarray(g.average().sample(20000, random_state=4))
        assert (mx >= tm - 1e-4).all()
        assert (mn <= av + 1e-4).all() and (av <= mx + 1e-4).all()

    def test_functional_requires_path(self):
        from probabilit_tpu.models.processes import PathFunctional

        with pytest.raises(TypeError, match="PathDistribution"):
            PathFunctional(Distribution("norm"), "max")

    def test_copy_parity_and_fresh_cache(self):
        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, steps=32)
        payoff = (g.maximum() < 130) * (g.terminal() - 100)
        base = np.asarray(payoff.sample(8000, random_state=4))
        clone = payoff.copy()
        np.testing.assert_array_equal(
            np.asarray(clone.sample(8000, random_state=4)), base
        )
        # The copied path node must not hand out functionals parented to
        # the ORIGINAL path.
        copied_paths = [
            n
            for n in clone.nodes()
            if type(n).__name__ == "GBMPath" and n is not g
        ]
        assert copied_paths
        fresh = copied_paths[0].average()
        assert fresh.path is copied_paths[0]


class TestGraphIntegration:
    def test_vector_node_correlate_rejected(self):
        w = BrownianMotion(steps=16)
        x = Distribution("norm")
        sink = (w.terminal() + x).correlate(w, x, corr_mat=np.eye(2))
        with pytest.raises(ValueError, match="vector-valued"):
            sink.sample(100, random_state=0)

    def test_streaming_estimate(self):
        from probabilit_tpu.engine import streaming

        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, steps=64)
        est = streaming.estimate(
            g.terminal(), 200_000, block_size=1 << 15, random_state=5
        )
        assert abs(est["mean"] - 100 * np.exp(0.05)) < 5 * est["sem"] + 0.05

    def test_mesh_bitwise_invariance(self):
        from probabilit_tpu.parallel import make_mesh, use_mesh

        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, steps=32)
        payoff = (g.maximum() < 130) * (g.terminal() - 100)
        base = np.asarray(payoff.sample(4096, random_state=3))
        with use_mesh(make_mesh()):
            sharded = np.asarray(payoff.sample(4096, random_state=3))
        np.testing.assert_array_equal(base, sharded)

    def test_reproducible_per_seed(self):
        w = BrownianMotion(steps=16)
        a = np.asarray(w.terminal().sample(1024, random_state=9))
        b = np.asarray(w.terminal().sample(1024, random_state=9))
        np.testing.assert_array_equal(a, b)
        c = np.asarray(w.terminal().sample(1024, random_state=10))
        assert not np.array_equal(a, c)


class TestOUPath:
    def test_exact_slice_laws(self):
        from probabilit_tpu import OrnsteinUhlenbeck

        ou = OrnsteinUhlenbeck(
            x0=0.3, theta=2.0, mu=0.05, sigma=0.4, T=1.0, steps=64
        )
        dt = 1.0 / 64
        a = np.exp(-2.0 * dt)
        for k in (0, 15, 63):
            s = np.asarray(ou.at(k).sample(30000, random_state=k))
            ak = a ** (k + 1)
            m = 0.05 + (0.3 - 0.05) * ak
            v = 0.4**2 * (1 - ak**2) / (2 * 2.0)
            p = stats.kstest(s[:8000], "norm", args=(m, np.sqrt(v))).pvalue
            assert p > 0.01, (k, p)

    def test_mean_reversion_to_stationary_law(self):
        from probabilit_tpu import OrnsteinUhlenbeck

        ou = OrnsteinUhlenbeck(x0=5.0, theta=3.0, mu=1.0, sigma=0.5, T=5.0, steps=128)
        s = np.asarray(ou.terminal().sample(30000, random_state=9))
        assert abs(s.mean() - 1.0) < 0.01
        assert abs(s.var() - 0.25 / 6) < 0.002

    def test_validation(self):
        from probabilit_tpu import OrnsteinUhlenbeck

        with pytest.raises(ValueError, match="theta"):
            OrnsteinUhlenbeck(theta=0.0)
        with pytest.raises(ValueError, match="sigma"):
            OrnsteinUhlenbeck(sigma=0.0)

    def test_mesh_bitwise(self):
        from probabilit_tpu import OrnsteinUhlenbeck
        from probabilit_tpu.parallel import make_mesh, use_mesh

        ou = OrnsteinUhlenbeck(theta=2.0, sigma=0.3, steps=32)
        expr = ou.average() + ou.terminal()
        base = np.asarray(expr.sample(4096, random_state=1))
        with use_mesh(make_mesh()):
            sharded = np.asarray(expr.sample(4096, random_state=1))
        np.testing.assert_array_equal(base, sharded)


class TestJumpProcesses:
    def test_poisson_terminal_exact_pmf(self):
        from probabilit_tpu import PoissonProcess

        p = PoissonProcess(rate=3.0, T=2.0, steps=64)
        s = np.asarray(p.terminal().sample(40000, random_state=0)).astype(int)
        for k in range(0, 12, 2):
            assert abs((s == k).mean() - stats.poisson.pmf(k, 6.0)) < 0.006, k

    def test_counting_path_monotone(self):
        from probabilit_tpu import PoissonProcess

        p = PoissonProcess(rate=3.0, T=2.0, steps=64)
        mx = np.asarray(p.maximum().sample(5000, random_state=1))
        p.terminal().sample(5000, random_state=1)
        np.testing.assert_array_equal(mx, np.asarray(p.terminal().samples_))

    def test_merton_exact_moments(self):
        from probabilit_tpu import MertonJumpDiffusion

        m = MertonJumpDiffusion(
            s0=100,
            mu=0.02,
            sigma=0.2,
            jump_rate=1.0,
            jump_mean=-0.05,
            jump_std=0.15,
            T=1.0,
            steps=64,
        )
        st = np.asarray(m.terminal().sample(200_000, random_state=2))
        expect = 100 * np.exp(0.02 + 1.0 * (np.exp(-0.05 + 0.15**2 / 2) - 1))
        sem = st.std() / np.sqrt(len(st))
        assert abs(st.mean() - expect) < 5 * sem + 0.05
        # Var[log S_T/s0] = sigma^2 T + lambda T (jump_mean^2 + jump_std^2)
        # — the exact compound-Poisson-normal decomposition.
        lv = np.log(st / 100).var()
        assert abs(lv - (0.04 + 0.0025 + 0.0225)) < 0.003

    def test_validation(self):
        from probabilit_tpu import MertonJumpDiffusion, PoissonProcess

        with pytest.raises(ValueError, match="rate"):
            PoissonProcess(rate=0.0)
        with pytest.raises(ValueError, match="jump_rate"):
            MertonJumpDiffusion(jump_rate=-1.0)
        with pytest.raises(ValueError, match="jump_std"):
            MertonJumpDiffusion(jump_std=-0.1)

    def test_mesh_bitwise(self):
        from probabilit_tpu import MertonJumpDiffusion
        from probabilit_tpu.parallel import make_mesh, use_mesh

        m = MertonJumpDiffusion(s0=100, sigma=0.2, jump_rate=0.5, steps=32)
        expr = m.minimum() / m.terminal()
        base = np.asarray(expr.sample(4096, random_state=5))
        with use_mesh(make_mesh()):
            sharded = np.asarray(expr.sample(4096, random_state=5))
        np.testing.assert_array_equal(base, sharded)


class TestPathwiseGreeks:
    """Pathwise parameter sensitivities (Greeks) of path functionals via
    autodiff through the compiled sampling program."""

    def test_gbm_terminal_greeks_analytic(self):
        import probabilit_tpu as pt
        from probabilit_tpu import GeometricBrownianMotion

        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, T=1.0, steps=32)
        res = pt.sensitivity(g.terminal(), wrt=g, size=1 << 16, random_state=0)
        # E[S_T] = s0 e^{mu T}: dE/dmu = s0 T e^{mu T}, dE/ds0 = e^{mu T},
        # dE/dsigma = 0 — the pathwise estimator lands on all three.
        assert res[(g, "mu")] == pytest.approx(100 * np.exp(0.05), abs=1.5)
        assert res[(g, "s0")] == pytest.approx(np.exp(0.05), abs=0.01)
        assert abs(res[(g, "sigma")]) < 1.5
        assert g.mu == 0.05 and g.sigma == 0.2  # parameters restored

    def test_ou_terminal_mu_and_x0(self):
        import probabilit_tpu as pt
        from probabilit_tpu import OrnsteinUhlenbeck

        ou = OrnsteinUhlenbeck(x0=0.5, theta=2.0, mu=0.1, sigma=0.3, T=1.0, steps=32)
        res = pt.sensitivity(ou.terminal(), wrt=ou, size=1 << 16, random_state=1)
        # E[X_T] = mu + (x0 - mu) e^{-theta T}: derivatives are exact
        # constants, so common-random-number noise is essentially zero.
        assert res[(ou, "mu")] == pytest.approx(1 - np.exp(-2.0), abs=1e-2)
        assert res[(ou, "x0")] == pytest.approx(np.exp(-2.0), abs=1e-2)

    def test_merton_asian_vega_positive_and_jump_rate_excluded(self):
        import probabilit_tpu as pt
        from probabilit_tpu import MertonJumpDiffusion

        m = MertonJumpDiffusion(
            s0=100, sigma=0.2, jump_rate=0.5, jump_mean=-0.03, jump_std=0.1, steps=32
        )
        asian = (m.average() - 100) * ((m.average() - 100) > 0)
        res = pt.sensitivity(asian, wrt=m, size=1 << 15, random_state=2)
        assert res[(m, "sigma")] > 0  # Asian call vega
        with pytest.raises(ValueError, match="no numeric scalar parameter"):
            pt.sensitivity(asian, wrt={m: ["jump_rate"]}, size=1024)

    def test_poisson_process_rejected(self):
        import probabilit_tpu as pt
        from probabilit_tpu import PoissonProcess

        p = PoissonProcess(rate=2.0, steps=16)
        with pytest.raises(ValueError, match="no differentiable"):
            pt.sensitivity(p.terminal(), wrt=p, size=1024)


class TestCorrelatedGBM:
    def _paths(self, steps=32):
        from probabilit_tpu import CorrelatedGBM

        return CorrelatedGBM(
            [100, 50, 10],
            [0.03, 0.02, 0.0],
            [0.2, 0.3, 0.15],
            [[1, 0.6, 0.2], [0.6, 1, 0.3], [0.2, 0.3, 1]],
            T=1.0,
            steps=steps,
        )

    def test_exact_marginals_and_joint_correlation(self):
        a, b, c = self._paths()
        (a.terminal() + b.terminal() + c.terminal()).sample(40000, random_state=0)
        la = np.log(np.asarray(a.terminal().samples_) / 100)
        lb = np.log(np.asarray(b.terminal().samples_) / 50)
        lc = np.log(np.asarray(c.terminal().samples_) / 10)
        # Marginals: each log-terminal is exactly N((mu-s^2/2)T, s^2 T).
        assert stats.kstest(la[:8000], "norm", args=(0.01, 0.2)).pvalue > 0.01
        assert stats.kstest(lb[:8000], "norm", args=(-0.025, 0.3)).pvalue > 0.01
        # Joint: log-terminal correlations equal the target EXACTLY in
        # distribution (shared recolored drivers, no discretisation).
        C = np.corrcoef(np.vstack([la, lb, lc]))
        assert abs(C[0, 1] - 0.6) < 0.02
        assert abs(C[0, 2] - 0.2) < 0.02
        assert abs(C[1, 2] - 0.3) < 0.02

    def test_views_have_full_functional_api(self):
        a, b, _ = self._paths()
        spread = a.terminal() - 2 * b.terminal()
        spread.sample(2000, random_state=1)
        mx = np.asarray(a.maximum().sample(2000, random_state=1))
        assert (mx >= np.asarray(a.terminal().samples_) - 1e-3).all()
        assert a.at(3) is a.at(3)

    def test_joint_node_functionals_rejected(self):
        a, _, _ = self._paths()
        with pytest.raises(TypeError, match="per-asset view"):
            a.joint.terminal()

    def test_copy_and_mesh_bitwise(self):
        from probabilit_tpu.parallel import make_mesh, use_mesh

        a, b, _ = self._paths()
        basket = 0.5 * a.terminal() + 0.5 * b.terminal()
        base = np.asarray(basket.sample(4096, random_state=3))
        np.testing.assert_array_equal(
            np.asarray(basket.copy().sample(4096, random_state=3)), base
        )
        with use_mesh(make_mesh()):
            sharded = np.asarray(basket.sample(4096, random_state=3))
        np.testing.assert_array_equal(base, sharded)

    def test_validation(self):
        from probabilit_tpu import CorrelatedGBM

        with pytest.raises(ValueError, match=">= 2 assets"):
            CorrelatedGBM([100], [0.0], [0.2], [[1.0]])
        with pytest.raises(ValueError, match="equal lengths"):
            CorrelatedGBM([100, 50], [0.0], [0.2, 0.3], np.eye(2))
        with pytest.raises(ValueError, match="unit diagonal"):
            CorrelatedGBM([100, 50], [0, 0], [0.2, 0.3], [[1, 0.9], [0.9, 2]])
        with pytest.raises(ValueError, match="positive definite"):
            CorrelatedGBM([100, 50], [0, 0], [0.2, 0.3], [[1, 1.5], [1.5, 1]])


class TestPathQMC:
    """QMC/antithetic methods on path nodes via Brownian-bridge slabs.

    In quantile mode every path node owns ``_q_width`` columns of the
    quantile matrix; Gaussian drivers are built through the orthogonal
    Brownian-bridge increment matrix (``ops/bridge.py``), so QMC
    dimension 0 controls the terminal point.  The reference has no
    paths at all; scipy-backed QMC cannot reach multivariate draws even
    for its own families (``modeling.py:144-148``).
    """

    def test_bridge_matrices_exact(self):
        from probabilit_tpu.ops import bridge

        for steps in (1, 2, 3, 7, 8, 252):
            B = bridge.bridge_matrix(steps)
            A = bridge.increment_matrix(steps)
            grid = np.arange(1, steps + 1, dtype=float)
            # W = z @ B.T must carry the exact BM covariance min(s, t).
            np.testing.assert_allclose(
                B @ B.T, np.minimum.outer(grid, grid), atol=1e-9
            )
            # Increments of a BM are iid: A is orthogonal.
            np.testing.assert_allclose(A @ A.T, np.eye(steps), atol=1e-12)
            # Dimension 0 drives the terminal point alone.
            assert B[-1, 0] == pytest.approx(np.sqrt(steps))
            assert np.all(B[-1, 1:] == 0.0)

    def test_sobol_exact_marginal_law(self):
        # OU terminal under sobol must follow the exact transition law.
        from probabilit_tpu import OrnsteinUhlenbeck

        ou = OrnsteinUhlenbeck(x0=2.0, theta=1.5, mu=0.5, sigma=0.8, steps=32)
        s = np.asarray(ou.terminal().sample(8192, random_state=0, method="sobol"))
        a = np.exp(-1.5)
        m = 0.5 + (2.0 - 0.5) * a
        v = 0.8**2 * (1 - a * a) / (2 * 1.5)
        assert stats.kstest(s, "norm", args=(m, np.sqrt(v))).pvalue > 0.01

    def test_sobol_variance_reduction(self):
        # The point of the bridge: QMC error on a terminal expectation
        # far below the iid-MC standard error at the same n.
        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, steps=16)
        n = 4096
        s = np.asarray(g.terminal().sample(n, random_state=0, method="sobol"))
        want = 100 * np.exp(0.05)
        iid_sem = 100 * np.exp(0.05) * 0.2 / np.sqrt(n)  # ~ sigma_S/sqrt(n)
        assert abs(s.mean() - want) < 0.25 * iid_sem

    def test_antithetic_pairs_reflect_paths(self):
        # A linear path functional is exactly pair-balanced: terminal of
        # arithmetic BM gives pair means == x0 + drift*T to f32 eps.
        w = BrownianMotion(x0=1.0, drift=0.3, diffusion=1.0, T=2.0, steps=8)
        s = np.asarray(
            w.terminal().sample(2048, random_state=1, method="antithetic")
        )
        pair_means = s.reshape(-1, 2).mean(axis=1)
        np.testing.assert_allclose(pair_means, 1.6, atol=5e-5)

    @pytest.mark.parametrize("method", ["sobol", "halton", "lhs", "antithetic"])
    def test_streamed_method_bitwise_equals_single_shot(self, method):
        from probabilit_tpu.engine import streaming

        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, steps=8)
        t = g.terminal()
        full = np.asarray(t.sample(512, random_state=3, method=method))
        blocks = streaming.sample_streaming(
            t, 512, block_size=128, random_state=3, method=method
        )
        np.testing.assert_array_equal(full, np.asarray(blocks))

    def test_mesh_invariance_under_sobol(self):
        from probabilit_tpu.parallel import make_mesh, use_mesh

        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, steps=8)
        payoff = (g.maximum() < 130) * (g.terminal() - 100)
        base = np.asarray(payoff.sample(4096, random_state=5, method="sobol"))
        with use_mesh(make_mesh()):
            sharded = np.asarray(payoff.sample(4096, random_state=5, method="sobol"))
        np.testing.assert_array_equal(base, sharded)

    def test_correlated_gbm_sobol_and_mesh(self):
        # Also regression-tests the rank-3 sharding constraint on the
        # joint (n, steps, d) draw (ndim=inc.ndim, was hardcoded 2).
        from probabilit_tpu import CorrelatedGBM
        from probabilit_tpu.parallel import make_mesh, use_mesh

        a, b = CorrelatedGBM(
            [100, 50], [0.03, 0.02], [0.2, 0.3], [[1, 0.6], [0.6, 1]], steps=8
        )
        basket = 0.5 * a.terminal() + 0.5 * b.terminal()
        base = np.asarray(basket.sample(4096, random_state=5, method="sobol"))
        with use_mesh(make_mesh()):
            sharded = np.asarray(basket.sample(4096, random_state=5, method="sobol"))
            prng = np.asarray(basket.sample(4096, random_state=5))
        np.testing.assert_array_equal(base, sharded)
        assert np.isfinite(prng).all()
        lc = np.corrcoef(
            np.log(np.asarray(a.terminal().samples_)),
            np.log(np.asarray(b.terminal().samples_)),
        )[0, 1]
        assert abs(lc - 0.6) < 0.03

    def test_merton_poisson_sobol_moments(self):
        from probabilit_tpu import MertonJumpDiffusion, PoissonProcess

        pp = PoissonProcess(rate=3.0, T=2.0, steps=16)
        sp = np.asarray(pp.terminal().sample(8192, random_state=0, method="sobol"))
        assert abs(sp.mean() - 6.0) < 0.05
        assert abs(sp.var() - 6.0) < 0.3

        mj = MertonJumpDiffusion(
            s0=100, mu=0.03, sigma=0.2, jump_rate=1.0,
            jump_mean=-0.05, jump_std=0.1, steps=16,
        )
        sm = np.asarray(
            mj.terminal().sample(16384, random_state=0, method="sobol")
        )
        want = 100 * np.exp(0.03 + 1.0 * (np.exp(-0.05 + 0.005) - 1))
        assert abs(sm.mean() - want) < 0.15

    def test_quantile_matrix_width_includes_slabs(self):
        from probabilit_tpu.engine import compile as _compile
        from probabilit_tpu.engine.sampler import sample_from_quantiles

        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, steps=8)
        x = Distribution("norm")
        sink = g.terminal() + x
        plan = _compile.get_plan(sink)
        assert plan.d == 2  # path seed column + norm
        # The path's scalar column doubles as slab dim 0, so the total
        # width is d + (steps - 1) extras: no wasted QMC dimension.
        assert plan.d_total == 2 + 7
        assert plan.columns_of(g) == (0, 2, 3, 4, 5, 6, 7, 8)
        with pytest.raises(ValueError, match="path-driver"):
            sample_from_quantiles(sink, np.random.default_rng(0).random((64, 2)))
        out = sample_from_quantiles(
            sink, np.random.default_rng(0).random((64, 9))
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_single_step_path_under_qmc(self):
        # steps=1 means a width-1 slab (just the node's own column);
        # regression: this used to KeyError in quantile mode.
        w = BrownianMotion(x0=0.0, drift=0.0, diffusion=1.0, T=1.0, steps=1)
        s = np.asarray(w.terminal().sample(4096, random_state=0, method="sobol"))
        assert stats.kstest(s, "norm").pvalue > 0.01

    def test_estimate_streamed_sobol_quantiles(self):
        from probabilit_tpu.engine import streaming

        g = GeometricBrownianMotion(s0=100, mu=0.05, sigma=0.2, steps=8)
        res = streaming.estimate(
            g.terminal(), 4096, block_size=1024, random_state=0, method="sobol"
        )
        assert abs(res["mean"] - 100 * np.exp(0.05)) < 0.3
