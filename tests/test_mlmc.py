"""Multilevel Monte Carlo (engine/mlmc.py).

Framework extension (no counterpart in the reference).  Tests pin the
estimator against closed-form GBM expectations, the telescoping
identity, the coupled-correction variance decay that gives MLMC its
complexity (beta ~ 1 for Euler, ~ 2 for Milstein at refine=4), and the
cost-optimal sample allocation.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probabilit_tpu.engine.mlmc import _level_kernel, _LevelState, mlmc_estimate


def _gbm(mu=0.05, sigma=0.2):
    return (lambda t, x: mu * x), (lambda t, x: sigma * x)


def _call(paths):
    return jnp.maximum(paths[:, -1] - 100.0, 0.0)


# Undiscounted E[(S_T - 100)^+] for GBM(mu=r=0.05, sigma=0.2, s0=100):
# e^{rT} times the Black-Scholes price 10.4506.
_CALL_TRUE = 10.9864


class TestEstimate:
    def test_gbm_call_within_eps(self):
        drift, diff = _gbm()
        res = mlmc_estimate(
            drift, diff, _call, x0=100.0, eps=0.05, random_state=0
        )
        assert abs(res["mean"] - _CALL_TRUE) < 3 * 0.05
        assert res["levels"] >= 2
        # MLMC must beat the projected plain-MC cost at this accuracy.
        assert res["cost"] < res["cost_mc"]

    def test_asian_average_payoff(self):
        # Continuous-limit time average: E[avg S] -> s0 (e^{mu T}-1)/(mu T).
        drift, diff = _gbm()
        res = mlmc_estimate(
            drift,
            diff,
            lambda paths: jnp.mean(paths, axis=1),
            x0=100.0,
            eps=0.1,
            random_state=1,
        )
        want = 100.0 * (math.exp(0.05) - 1.0) / 0.05
        assert abs(res["mean"] - want) < 3 * 0.1

    def test_allocation_decreasing(self):
        drift, diff = _gbm()
        res = mlmc_estimate(
            drift, diff, _call, x0=100.0, eps=0.05, random_state=2
        )
        n = res["n_per_level"]
        assert all(a >= b for a, b in zip(n, n[1:]))
        # Correction variances fall with level.
        v = res["variances"]
        assert all(a > b for a, b in zip(v, v[1:]))

    def test_validation(self):
        drift, diff = _gbm()
        for kw in (dict(eps=0.0), dict(refine=1), dict(m0=0), dict(max_levels=1)):
            with pytest.raises(ValueError):
                mlmc_estimate(drift, diff, _call, x0=100.0, **kw)


class TestNodeAPI:
    """mlmc_estimate(node, payoff, ...): path nodes drive the hierarchy."""

    def test_sde_node_matches_callable_api(self):
        from probabilit_tpu import SDE

        drift, diff = _gbm()
        r1 = mlmc_estimate(drift, diff, _call, x0=100.0, eps=0.15,
                           random_state=0)
        # node.steps is ignored: the level hierarchy supplies the grids,
        # so the SAME keys give the IDENTICAL estimate.
        sde = SDE(drift, diff, x0=100.0, T=1.0, steps=999)
        r2 = mlmc_estimate(sde, _call, eps=0.15, random_state=0)
        assert r2["mean"] == r1["mean"]
        assert r2["levels"] == r1["levels"]
        assert r2["n_per_level"] == r1["n_per_level"]

    def test_gbm_exact_law_terminal_coupling_is_exact(self):
        # Exact-law coupling: the coarse GBM terminal from renormalised
        # driver sums IS the fine terminal, so every correction is zero
        # and a single level carries the whole estimate.
        from probabilit_tpu import GeometricBrownianMotion

        gbm = GeometricBrownianMotion(
            s0=100.0, mu=0.05, sigma=0.2, T=1.0, steps=4
        )
        res = mlmc_estimate(gbm, _call, eps=0.2, random_state=1)
        assert res["variances"][1] < 1e-8
        want = 10.4506 * math.exp(0.05)  # e^{rT} x BS(100,100,0.2,1)
        assert abs(res["mean"] - want) < 3 * 0.2

    def test_gbm_exact_law_asian_corrections_decay(self):
        # For a grid functional (time average) the corrections measure
        # pure functional refinement with NO scheme bias at any level.
        from probabilit_tpu import GeometricBrownianMotion

        gbm = GeometricBrownianMotion(
            s0=100.0, mu=0.05, sigma=0.2, T=1.0, steps=4
        )
        asian = lambda p: jnp.maximum(jnp.mean(p, axis=1) - 100.0, 0.0)
        res = mlmc_estimate(gbm, asian, eps=0.05, random_state=0)
        v = res["variances"]
        assert len(v) >= 3
        assert v[1] / v[-1] > 4.0  # decaying corrections

    def test_node_api_validation(self):
        from probabilit_tpu import GeometricBrownianMotion, MertonJumpDiffusion

        gbm = GeometricBrownianMotion(s0=100.0, mu=0.05, sigma=0.2, steps=4)
        with pytest.raises(ValueError, match="x0 comes from the node"):
            mlmc_estimate(gbm, _call, x0=1.0)
        with pytest.raises(ValueError, match="payoff"):
            mlmc_estimate(gbm)
        # Families whose per-step randomness is not one standard normal
        # have no exact-law grid coupling.
        mj = MertonJumpDiffusion(s0=100.0, steps=4)
        with pytest.raises(NotImplementedError, match="grid refinement"):
            mlmc_estimate(mj, _call, eps=0.1)


class TestCoupling:
    def _level_state(self, level, scheme, n=20000, seed=0):
        from probabilit_tpu.models.sde import SDEPath

        drift, diff = _gbm()
        rows = 4096

        def make_node(steps):
            return SDEPath(
                drift, diff, x0=100.0, T=1.0, steps=steps, scheme=scheme
            )

        kernel, steps = _level_kernel(make_node, _call, 4, 4, level, rows)
        st = _LevelState(kernel, steps, steps, rows)
        st.extend(jax.random.PRNGKey(seed), n)
        return st

    def test_telescoping_identity(self):
        # sum of correction means over levels 0..2 and the DIRECT fine
        # estimate at level 2 both estimate E[P_2]; they must agree
        # within combined standard errors.
        states = [self._level_state(lv, "euler", n=60000, seed=lv) for lv in range(3)]
        telescoped = sum(st.mean for st in states)
        direct = states[-1].f1 / states[-1].n
        se = math.sqrt(
            sum(st.var / st.n for st in states)
            + states[-1].fine_var / states[-1].n
        )
        assert abs(telescoped - direct) < 4 * se

    def test_variance_decay_euler_vs_milstein(self):
        # At refine=4: Euler corrections decay ~4x per level (beta~1),
        # Milstein ~16x (beta~2); Milstein corrections are far smaller.
        e1 = self._level_state(1, "euler", seed=10)
        e2 = self._level_state(2, "euler", seed=11)
        m1 = self._level_state(1, "milstein", seed=12)
        m2 = self._level_state(2, "milstein", seed=13)
        assert 2.0 < e1.var / e2.var < 9.0
        assert m1.var / m2.var > 6.0
        assert m1.var < 0.25 * e1.var

    def test_coarse_driver_renormalisation(self):
        # Zero diffusion makes the path deterministic; the coupled
        # correction is then exactly the quadrature difference of the
        # two grids — checks the driver plumbing end to end.
        from probabilit_tpu.models.sde import SDEPath

        def make_node(steps):
            return SDEPath(
                lambda t, x: jnp.cos(t),
                lambda t, x: 0.0,
                x0=0.0,
                T=1.0,
                steps=steps,
                scheme="euler",
            )

        kernel, _ = _level_kernel(make_node, lambda p: p[:, -1], 4, 4, 1, 64)
        s1, _, _, _ = (float(v) for v in np.asarray(kernel(jax.random.PRNGKey(0), 64, 0)))
        dt_f, dt_c = 1 / 16, 1 / 4
        want = np.cos(dt_f * np.arange(16)).sum() * dt_f - np.cos(
            dt_c * np.arange(4)
        ).sum() * dt_c
        assert s1 / 64 == pytest.approx(want, abs=1e-6)


class TestMesh:
    def test_mlmc_mesh_matches_single_device(self):
        from probabilit_tpu.parallel import make_mesh, use_mesh

        drift, diff = _gbm()
        kw = dict(x0=100.0, eps=0.1, random_state=0)
        base = mlmc_estimate(drift, diff, _call, **kw)
        with use_mesh(make_mesh()):
            sharded = mlmc_estimate(drift, diff, _call, **kw)
        # Identical counter-based draws; only reduction order may move.
        assert sharded["n_per_level"] == base["n_per_level"]
        assert sharded["mean"] == pytest.approx(base["mean"], rel=1e-4)


class TestMLQMC:
    def test_sobol_levels_beat_prng_accuracy(self):
        # Same eps budget; QMC-within-levels (Giles-Waterhouse) must cut
        # the realised error well below the PRNG run's.
        drift, diff = _gbm()
        sob = [
            mlmc_estimate(
                drift, diff, _call, x0=100.0, eps=0.05,
                random_state=r, method="sobol",
            )["mean"]
            for r in range(4)
        ]
        err = np.abs(np.asarray(sob) - _CALL_TRUE)
        assert err.max() < 0.02  # PRNG at eps=0.05 sits near 0.05

    def test_method_validation(self):
        drift, diff = _gbm()
        with pytest.raises(ValueError, match="lhs"):
            mlmc_estimate(drift, diff, _call, x0=100.0, method="lhs")
        with pytest.raises(ValueError, match="method"):
            mlmc_estimate(drift, diff, _call, x0=100.0, method="qmc")
