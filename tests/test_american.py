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


class TestJointStateLSMC:
    """Multi-factor continuation regression on the full Markov state."""

    _put10 = staticmethod(lambda s: jnp.maximum(10.0 - s, 0.0))

    def test_heston_joint_beats_asset_basis_vs_fd_benchmark(self):
        # Ikonen-Toivanen (2007) American put FD reference: K=10, r=0.1,
        # T=0.25, v0=0.0625, kappa=5, theta=0.16, sigma=0.9, rho=0.1;
        # price(s0=9) = 1.1080.  The joint (S, V) basis must beat the
        # asset-only two-pass lower bound by > 3 SE (same seeds: the
        # difference is common-random-number paired) and sit within the
        # benchmark's reach from below.
        h = Heston(
            s0=9.0, mu=0.1, v0=0.0625, kappa=5.0, theta=0.16, sigma=0.9,
            rho=0.1, T=0.25, steps=50,
        )
        pj = american_price(
            h, self._put10, rate=0.1, size=1 << 16, random_state=0,
            state="joint",
        )
        pa = american_price(
            h, self._put10, rate=0.1, size=1 << 16, random_state=0,
            state="asset",
        )
        se = max(pj["se"], pa["se"])
        assert pj["price"] - pa["price"] > 3.0 * se
        ref = 1.1080
        assert pj["price"] < ref + 3 * pj["se"]  # genuine lower bound
        assert pj["price"] > ref * 0.985  # and a tight one

    def test_joint_is_default_for_heston(self):
        h = Heston(
            s0=9.0, mu=0.1, v0=0.0625, kappa=5.0, theta=0.16, sigma=0.9,
            rho=0.1, T=0.25, steps=20,
        )
        auto = american_price(h, self._put10, rate=0.1, size=1 << 14,
                              random_state=1)
        joint = american_price(h, self._put10, rate=0.1, size=1 << 14,
                               random_state=1, state="joint")
        assert auto["price"] == joint["price"]
        # Joint basis at degree 3 in 2 states: 10 monomials per date.
        assert auto["weights"].shape == (19, 10)

    def test_custom_state_callable(self):
        h = Heston(
            s0=9.0, mu=0.1, v0=0.0625, kappa=5.0, theta=0.16, sigma=0.9,
            rho=0.1, T=0.25, steps=20,
        )
        res = american_price(
            h, self._put10, rate=0.1, size=1 << 14, random_state=2,
            state=lambda s, v: (s, jnp.sqrt(v)),
        )
        assert res["weights"].shape == (19, 10)
        assert 0.9 < res["price"] < 1.3

    def test_single_factor_unchanged_by_state_modes(self):
        gbm = GeometricBrownianMotion(s0=36.0, mu=0.06, sigma=0.2, T=1.0,
                                      steps=20)
        a = american_price(gbm, _put(40.0), rate=0.06, size=1 << 14,
                           random_state=3, state="asset")
        j = american_price(gbm, _put(40.0), rate=0.06, size=1 << 14,
                           random_state=3, state="joint")
        assert a["price"] == j["price"]


class TestAmericanGreeks:
    """Frozen-policy pathwise delta/vega/rho."""

    def test_gbm_put_greeks_match_finite_differences(self):
        from probabilit_tpu.engine.american import american_greeks

        put = _put(40.0)
        gbm = GeometricBrownianMotion(s0=40.0, mu=0.06, sigma=0.2, T=1.0,
                                      steps=16)
        g = american_greeks(gbm, put, rate=0.06, size=1 << 16,
                            random_state=0)
        assert set(g) >= {"price", "se", "s0", "mu", "sigma", "rate"}

        def price_at(s0, sigma):
            node = GeometricBrownianMotion(s0=s0, mu=0.06, sigma=sigma,
                                           T=1.0, steps=16)
            return american_price(node, put, rate=0.06, size=1 << 16,
                                  random_state=0)["price"]

        eps = 0.25
        fd_delta = (price_at(40 + eps, 0.2) - price_at(40 - eps, 0.2)) / (
            2 * eps
        )
        fd_vega = (price_at(40, 0.21) - price_at(40, 0.19)) / 0.02
        # ATM American put: delta in (-1, 0), positive vega.
        assert -1.0 < g["s0"] < 0.0
        assert g["sigma"] > 0.0
        assert g["s0"] == pytest.approx(fd_delta, abs=0.02)
        assert g["sigma"] == pytest.approx(fd_vega, rel=0.05)
        # Longer discounting lowers the put value.
        assert g["rate"] < 0.0

    def test_wrt_subset_and_validation(self):
        from probabilit_tpu.engine.american import american_greeks

        put = _put(40.0)
        gbm = GeometricBrownianMotion(s0=36.0, mu=0.06, sigma=0.2, T=1.0,
                                      steps=8)
        g = american_greeks(gbm, put, rate=0.06, wrt=["s0"], size=1 << 13,
                            random_state=1)
        assert set(g) == {"price", "se", "s0"}
        with pytest.raises(ValueError, match="no differentiable parameter"):
            american_greeks(gbm, put, wrt=["kappa"], size=1 << 12)

    def test_heston_delta(self):
        from probabilit_tpu.engine.american import american_greeks

        h = Heston(
            s0=9.0, mu=0.1, v0=0.0625, kappa=5.0, theta=0.16, sigma=0.9,
            rho=0.1, T=0.25, steps=16,
        )
        g = american_greeks(
            h, lambda s: jnp.maximum(10.0 - s, 0.0), rate=0.1,
            wrt=["s0", "rate"], size=1 << 14, random_state=2,
        )
        assert -1.0 < g["s0"] < -0.3  # ITM-ish put delta
        assert g["rate"] < 0.0

    def test_se_belongs_to_the_reported_price(self):
        # The returned se must be the EVALUATION sample's standard
        # error (the sample the price is the mean of), matching the
        # magnitude of american_price's two-pass se at the same size —
        # not the pass-1 in-sample se of a different sample.
        from probabilit_tpu.engine.american import american_greeks

        put = _put(40.0)
        gbm = GeometricBrownianMotion(s0=40.0, mu=0.06, sigma=0.2, T=1.0,
                                      steps=8)
        g = american_greeks(gbm, put, rate=0.06, wrt=["s0"], size=1 << 14,
                            random_state=3)
        p = american_price(gbm, put, rate=0.06, size=1 << 14,
                           random_state=3)
        assert g["se"] > 0
        assert 0.5 < g["se"] / p["se"] < 2.0
        # And the price is consistent with the two-pass estimate.
        assert g["price"] == pytest.approx(p["price"], abs=5 * p["se"] + 0.05)

    def test_greek_sems_shrink_with_replicates(self):
        from probabilit_tpu.engine.american import american_greeks

        put = _put(40.0)
        gbm = GeometricBrownianMotion(s0=40.0, mu=0.06, sigma=0.2, T=1.0,
                                      steps=8)
        g16 = american_greeks(gbm, put, rate=0.06, wrt=["s0", "sigma"],
                              size=1 << 12, random_state=5, replicates=16)
        assert set(g16) >= {"price", "se", "replicates", "s0", "s0_sem",
                            "sigma", "sigma_sem"}
        assert g16["s0_sem"] > 0 and g16["sigma_sem"] > 0
        assert -1.0 < g16["s0"] < 0.0
        g64 = american_greeks(gbm, put, rate=0.06, wrt=["s0", "sigma"],
                              size=1 << 12, random_state=5, replicates=64)
        # 1/sqrt(R) law: expected ratio 0.5; the threshold leaves room
        # for the chi-noise of the 15-dof R=16 sem estimate (sems from
        # 4x the replicates must clearly shrink, observed ~0.57).
        assert g64["s0_sem"] < g16["s0_sem"] * 0.85
        # Greeks still match central finite differences.
        def price_at(s0):
            node = GeometricBrownianMotion(s0=s0, mu=0.06, sigma=0.2,
                                           T=1.0, steps=8)
            return american_price(node, put, rate=0.06, size=1 << 15,
                                  random_state=0)["price"]

        fd_delta = (price_at(40.5) - price_at(39.5))
        assert g64["s0"] == pytest.approx(fd_delta, abs=6 * g64["s0_sem"] + 0.02)

    def test_price_replicates(self):
        gbm = GeometricBrownianMotion(s0=36.0, mu=0.06, sigma=0.2, T=1.0,
                                      steps=8)
        put = _put(40.0)
        res = american_price(gbm, put, rate=0.06, size=1 << 12,
                             random_state=5, replicates=4)
        assert res["replicates"] == 4 and res["se"] > 0
        assert res["price"] > 3.0
        with pytest.raises(ValueError, match="two_pass"):
            american_price(gbm, put, rate=0.06, size=1 << 12,
                           two_pass=False, replicates=4)
        with pytest.raises(ValueError, match="replicates must be"):
            american_price(gbm, put, rate=0.06, size=1 << 12, replicates=1)


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
        with pytest.raises(ValueError, match="state must be"):
            american_price(gbm, _put(40.0), state="volatility")


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


class TestMultiAssetLSMC:
    """Bermudan exercise on joint multi-asset nodes (round 4).

    The payoff receives one per-asset slice per argument and the
    continuation regression conditions on the full joint state
    (engine/american.py _call_payoff / _sample_states).
    """

    @staticmethod
    def _max_call(k):
        return lambda s1, s2: jnp.maximum(jnp.maximum(s1, s2) - k, 0.0)

    def _two_asset_node(self, delta=0.10, rho=0.0):
        from probabilit_tpu import CorrelatedGBM

        a, _b = CorrelatedGBM(
            [100.0, 100.0], [0.05 - delta] * 2, [0.2, 0.2],
            [[1.0, rho], [rho, 1.0]], T=3.0, steps=9,
        )
        return a.joint

    def test_max_call_andersen_broadie_benchmark(self):
        # Bermudan max-call, 2 assets: S0=100, K=100, r=5%, dividend
        # 10%, sigma=20%, rho=0, T=3, 9 exercise dates.  True value
        # 13.902 (Andersen-Broadie 2004, Table 2 reports the 90% CI
        # [13.892, 13.934]).  The two-pass estimate is a genuine lower
        # bound: assert it sits below the upper bound and within a few
        # SE of the published lower bound.  degree=5 + sobol measured
        # 13.894 +/- 0.041 at 2^17; NOTE degree=7 overfits in float32
        # and the (still valid) bound collapses loose — the two-pass
        # design is self-penalising, not silently biased high.
        node = self._two_asset_node()
        res = american_price(
            node, self._max_call(100.0), rate=0.05, size=1 << 16,
            degree=5, method="sobol", random_state=0,
        )
        assert res["price"] < 13.934 + 2 * res["se"]
        assert res["price"] > 13.902 - 4 * res["se"]
        assert 0.2 < res["exercise_fraction"] < 0.9

    def test_max_call_no_dividend_equals_european(self):
        # Without dividends early exercise of a max-call is never
        # optimal, so the Bermudan price equals the European one — the
        # same internal-consistency check the scalar suite runs, now on
        # the joint node (European leg priced on the view graph).
        # Regression state: (max, min) of the assets — the LS 2001 §8.4
        # basis for max options.  Raw (s1, s2) monomials underestimate
        # the continuation near the money and leak ~1.8% through
        # spurious early exercise (measured: exercise fraction 29% for
        # a policy whose optimum never exercises; 0.2% with max/min).
        from probabilit_tpu import CorrelatedGBM

        a, b = CorrelatedGBM(
            [100.0, 100.0], [0.05, 0.05], [0.2, 0.2],
            [[1.0, 0.3], [0.3, 1.0]], T=1.0, steps=8,
        )
        res = american_price(
            a.joint, self._max_call(100.0), rate=0.05, size=1 << 16,
            method="sobol", random_state=1,
            state=lambda s1, s2: (jnp.maximum(s1, s2), jnp.minimum(s1, s2)),
        )
        assert res["exercise_fraction"] < 0.05
        import math

        euro_node = math.exp(-0.05) * Maximum_helper(a, b)
        euro = float(
            np.asarray(
                euro_node.sample(1 << 16, random_state=2, method="sobol")
            ).mean()
        )
        assert abs(res["price"] - euro) < 4 * res["se"] + 0.02

    def test_correlation_lowers_max_call(self):
        # max(S1, S2) benefits from dispersion: raising rho must lower
        # the price (rho=1 degenerates to a single asset).
        lo = american_price(
            self._two_asset_node(rho=0.0), self._max_call(100.0),
            rate=0.05, size=1 << 15, method="sobol", random_state=3,
        )
        hi = american_price(
            self._two_asset_node(rho=0.8), self._max_call(100.0),
            rate=0.05, size=1 << 15, method="sobol", random_state=3,
        )
        assert hi["price"] < lo["price"] - 2 * (lo["se"] + hi["se"])

    def test_correlated_heston_min_put_runs_with_joint_state(self):
        # 2 assets + 2 variances = 4 regression states; bound ordering
        # (two-pass <= in-sample + slack) is the built-in correctness
        # check, exactly as the scalar Heston tests use.
        from probabilit_tpu import CorrelatedHeston

        a, _b = CorrelatedHeston(
            [100.0, 100.0], [0.05, 0.05], v0=0.04, kappa=2.0, theta=0.04,
            sigma=0.3, rho=[-0.5, -0.5], corr=[[1, 0.4], [0.4, 1]],
            T=1.0, steps=8,
        )
        payoff = lambda s1, s2: jnp.maximum(100.0 - jnp.minimum(s1, s2), 0.0)
        two = american_price(
            a.joint, payoff, rate=0.05, size=1 << 14, degree=2,
            random_state=4,
        )
        one = american_price(
            a.joint, payoff, rate=0.05, size=1 << 14, degree=2,
            random_state=4, two_pass=False,
        )
        assert np.isfinite(two["price"]) and two["price"] > 0
        assert two["price"] <= one["price"] + 3 * (two["se"] + one["se"])
        # Must exceed both the European min-put (early exercise has
        # value for puts) and intrinsic (ATM: 0).
        assert two["price"] > 0.5


def Maximum_helper(a, b):
    """max(terminal_a, terminal_b) as a graph node (no Maximum import)."""
    ta, tb = a.terminal(), b.terminal()
    cond = ta > tb
    call_a = (ta - 100.0) * ((ta - 100.0) > 0)
    call_b = (tb - 100.0) * ((tb - 100.0) > 0)
    return cond * call_a + (1 - cond) * call_b
