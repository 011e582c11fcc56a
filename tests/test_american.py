"""Longstaff-Schwartz LSMC (engine/american.py).

Framework extension (no counterpart in the reference).  Prices are
pinned against the finite-difference American-put benchmarks from
Longstaff & Schwartz (2001, table 1), the no-early-exercise identity
for calls on non-dividend assets, and ordering/diagnostic invariants.
"""

import math

import numpy as np
import pytest
from scipy import stats

import jax.numpy as jnp

from probabilit_tpu import SDE, GeometricBrownianMotion, Heston
from probabilit_tpu.engine.american import american_price


def _put(strike):
    return lambda s: jnp.maximum(strike - s, 0.0)


def _bs_put(s0, k, r, sigma, T):
    d1 = (math.log(s0 / k) + (r + 0.5 * sigma**2) * T) / (sigma * math.sqrt(T))
    d2 = d1 - sigma * math.sqrt(T)
    return k * math.exp(-r * T) * stats.norm.cdf(-d2) - s0 * stats.norm.cdf(-d1)


class TestAmericanPut:
    @pytest.mark.parametrize(
        "s0,fd_value",
        [(36.0, 4.478), (40.0, 2.314), (44.0, 1.110)],
    )
    def test_ls_table1_benchmarks(self, s0, fd_value):
        gbm = GeometricBrownianMotion(s0=s0, mu=0.06, sigma=0.2, T=1.0, steps=50)
        res = american_price(
            gbm, _put(40.0), rate=0.06, size=1 << 16, random_state=0
        )
        # Two-pass LSMC is a lower bound: slightly below FD, never far.
        assert res["price"] < fd_value + 3 * res["se"]
        assert abs(res["price"] - fd_value) < 0.04
        assert res["se"] < 0.02

    def test_dominates_european_and_intrinsic(self):
        s0, k, r, sigma = 36.0, 40.0, 0.06, 0.2
        gbm = GeometricBrownianMotion(s0=s0, mu=r, sigma=sigma, T=1.0, steps=50)
        res = american_price(gbm, _put(k), rate=r, size=1 << 16, random_state=1)
        european = _bs_put(s0, k, r, sigma, 1.0)
        assert res["price"] > european + 0.3  # deep early-exercise premium
        assert res["price"] >= k - s0  # intrinsic floor
        assert 0.1 < res["exercise_fraction"] < 1.0

    def test_call_no_dividend_never_early(self):
        # A call on a non-dividend asset is worth its European value;
        # LSMC must not manufacture early-exercise premium.
        s0 = k = 100.0
        r, sigma = 0.06, 0.2
        gbm = GeometricBrownianMotion(s0=s0, mu=r, sigma=sigma, T=1.0, steps=50)
        res = american_price(
            gbm,
            lambda s: jnp.maximum(s - k, 0.0),
            rate=r,
            size=1 << 16,
            random_state=2,
        )
        d1 = (math.log(s0 / k) + (r + 0.5 * sigma**2)) / sigma
        bs_call = s0 * stats.norm.cdf(d1) - k * math.exp(-r) * stats.norm.cdf(
            d1 - sigma
        )
        assert res["price"] == pytest.approx(bs_call, abs=0.25)

    def test_one_pass_has_foresight_bias(self):
        gbm = GeometricBrownianMotion(s0=40.0, mu=0.06, sigma=0.2, T=1.0, steps=50)
        two = american_price(
            gbm, _put(40.0), rate=0.06, size=1 << 15, random_state=3
        )
        one = american_price(
            gbm, _put(40.0), rate=0.06, size=1 << 15, random_state=3, two_pass=False
        )
        se = math.hypot(two["se"], one["se"])
        assert one["price"] > two["price"] - 3 * se

    def test_weights_shape(self):
        gbm = GeometricBrownianMotion(s0=40.0, mu=0.06, sigma=0.2, T=1.0, steps=10)
        res = american_price(
            gbm, _put(40.0), rate=0.06, size=4096, degree=2, random_state=4
        )
        assert res["weights"].shape == (9, 3)


class TestOtherNodes:
    def test_sde_euler_gbm_close_to_exact_node(self):
        r, sigma = 0.06, 0.2
        sde = SDE(
            lambda t, x: r * x, lambda t, x: sigma * x, x0=36.0, T=1.0, steps=50
        )
        res = american_price(sde, _put(40.0), rate=r, size=1 << 16, random_state=5)
        assert abs(res["price"] - 4.478) < 0.08

    def test_heston_put_bounds(self):
        h = Heston(
            s0=36.0, mu=0.06, v0=0.04, kappa=2.0, theta=0.04, sigma=0.3,
            rho=-0.7, T=1.0, steps=50,
        )
        res = american_price(h, _put(40.0), rate=0.06, size=1 << 16, random_state=6)
        # European lower bound from the same model's terminal law.
        term = np.asarray(h.terminal().sample(1 << 16, random_state=7))
        european = math.exp(-0.06) * np.maximum(40.0 - term, 0.0).mean()
        assert res["price"] > european - 3 * res["se"]
        assert res["price"] >= 4.0  # >= intrinsic
        assert res["price"] < 40.0


class TestValidation:
    def test_rejects_bad_arguments(self):
        gbm = GeometricBrownianMotion(s0=40.0, mu=0.06, sigma=0.2, steps=10)
        with pytest.raises(ValueError, match="degree"):
            american_price(gbm, _put(40.0), degree=0)
        with pytest.raises(ValueError, match="too small"):
            american_price(gbm, _put(40.0), size=4)
        one_step = GeometricBrownianMotion(s0=40.0, mu=0.06, sigma=0.2, steps=1)
        with pytest.raises(ValueError, match="steps"):
            american_price(one_step, _put(40.0))


class TestMesh:
    def test_american_mesh_matches_single_device(self):
        from probabilit_tpu.parallel import make_mesh, use_mesh

        gbm = GeometricBrownianMotion(s0=36.0, mu=0.06, sigma=0.2, T=1.0, steps=50)
        payoff = _put(40.0)
        base = american_price(gbm, payoff, rate=0.06, size=1 << 15, random_state=0)
        with use_mesh(make_mesh()):
            sharded = american_price(
                gbm, payoff, rate=0.06, size=1 << 15, random_state=0
            )
        # Same draws; Gram psum reduction order can flip boundary
        # exercise decisions, moving the price by O(se) at most.
        assert sharded["price"] == pytest.approx(
            base["price"], abs=3 * base["se"]
        )
        assert 0.0 < sharded["exercise_fraction"] < 1.0


class TestQMCPaths:
    def test_sobol_tightens_seed_spread(self):
        gbm = GeometricBrownianMotion(s0=36.0, mu=0.06, sigma=0.2, T=1.0, steps=50)
        payoff = _put(40.0)
        sob = [
            american_price(
                gbm, payoff, rate=0.06, size=1 << 14,
                random_state=r, method="sobol",
            )["price"]
            for r in range(4)
        ]
        sob = np.asarray(sob)
        # Measured: sobol spread ~0.008 vs prng ~0.020 at 2^14 paths.
        assert np.abs(sob - 4.478).max() < 0.04
        assert sob.std() < 0.015

    def test_method_validation(self):
        gbm = GeometricBrownianMotion(s0=40.0, mu=0.06, sigma=0.2, steps=10)
        with pytest.raises(ValueError, match="method"):
            american_price(gbm, _put(40.0), method="qmc")
