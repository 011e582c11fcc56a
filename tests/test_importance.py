"""Importance sampling via quantile-space tilting (engine/importance.py).

Framework extension — the reference has no variance-reduction machinery;
these tests validate unbiasedness against closed-form normal tails at
depths plain Monte Carlo cannot reach (P ~ 1e-9 .. 1e-19).
"""

import numpy as np
import pytest
import scipy.stats

from probabilit_tpu import suggest_tilt, tilted
from probabilit_tpu.engine import streaming


class TestSuggestTilt:
    def test_small_p_asymptotic(self):
        # k* ~ c*/a with c* = 1.5936 the root of (c-2)e^c + 2 = 0.
        for p in (1e-6, 1e-9, 1e-15):
            a = -np.log1p(-p)
            c = suggest_tilt(p) * a
            assert 1.55 < c < 1.64, (p, c)

    def test_moderate_p(self):
        # Still a minimiser, not the asymptote: check first-order
        # stationarity of the closed-form second moment.
        p = 0.01
        a = -np.log1p(-p)
        k = suggest_tilt(p)

        def m(kk):
            return np.expm1(a * (kk - 2.0)) / (kk * (kk - 2.0))

        assert m(k) <= m(k * 1.05) and m(k) <= m(k / 1.05)

    def test_validation(self):
        for bad in (0.0, 1.0, -0.5):
            with pytest.raises(ValueError, match="probability"):
                suggest_tilt(bad)


class TestTilted:
    def test_six_sigma_lower_tail(self):
        # P(Z < -6) = 9.87e-10: plain MC needs ~1e9 draws per HIT; the
        # tilted estimator resolves it to <1% with 2e5 draws.  The
        # tolerance is ~5 sigma of the estimator's own sem (~0.17%).
        p_true = float(scipy.stats.norm.cdf(-6.0))
        x, w = tilted("norm", k=suggest_tilt(p_true), tail="lower")
        est = streaming.estimate(
            (x < -6.0) * w, 200_000, block_size=32_768, random_state=0
        )
        assert abs(est["mean"] / p_true - 1.0) < 0.01
        assert est["sem"] / est["mean"] < 0.005

    def test_nine_sigma_lower_tail(self):
        # p ~ 1.1e-19 — beyond ANY brute-force budget, and beyond
        # float64 uniform resolution too; the log-space tilt still
        # resolves it in float32.
        p_true = float(scipy.stats.norm.cdf(-9.0))
        x, w = tilted("norm", k=suggest_tilt(p_true), tail="lower")
        est = streaming.estimate(
            (x < -9.0) * w, 200_000, block_size=32_768, random_state=5
        )
        assert abs(est["mean"] / p_true - 1.0) < 0.02

    def test_upper_tail_moderate(self):
        # Upper tilts represent u near 1, so f32 caps them at ~1e-6
        # depth; a 3-sigma event is comfortably within range.
        p_true = float(scipy.stats.norm.sf(3.0))
        x, w = tilted("norm", k=suggest_tilt(p_true), tail="upper")
        est = streaming.estimate(
            (x > 3.0) * w, 100_000, block_size=16_384, random_state=3
        )
        assert abs(est["mean"] / p_true - 1.0) < 0.02

    def test_weight_normalisation(self):
        # E[w] = 1 exactly; use a gentle tilt so the anti-tilted
        # region's weights stay bounded (heavy-weight noise at large k
        # is intrinsic to IS normalisation, not a defect).
        _, w = tilted("norm", k=1.5, tail="lower")
        est = streaming.estimate(
            w, 200_000, block_size=32_768, random_state=1
        )
        assert abs(est["mean"] - 1.0) < 5 * est["sem"] + 1e-3

    def test_lognormal_family(self):
        # Wide lognorm kernel: P(X < t) for deep-left lognormal tail.
        p_true = float(scipy.stats.lognorm(0.5).cdf(np.exp(-3.0)))  # Phi(-6)
        x, w = tilted("lognorm", k=suggest_tilt(p_true), tail="lower", s=0.5)
        est = streaming.estimate(
            (x < np.exp(-3.0)) * w, 200_000, block_size=32_768, random_state=2
        )
        assert abs(est["mean"] / p_true - 1.0) < 0.02

    def test_k_one_is_plain_mc(self):
        x, w = tilted("norm", k=1.0, tail="lower", loc=2.0)
        from probabilit_tpu.models.graph import NoOp

        NoOp(x, w).sample(4096, random_state=0)
        np.testing.assert_allclose(np.asarray(w.samples_), 1.0, rtol=1e-6)
        assert abs(np.asarray(x.samples_).mean() - 2.0) < 0.1

    def test_composes_with_sobol_and_replicates(self):
        p_true = float(scipy.stats.norm.cdf(-6.0))
        x, w = tilted("norm", k=suggest_tilt(p_true), tail="lower")
        est = streaming.estimate(
            (x < -6.0) * w, 131_072, block_size=16_384, random_state=4,
            method="sobol", replicates=4,
        )
        assert abs(est["mean"] / p_true - 1.0) < 0.05
        assert est["replicates"] == 4

    def test_validation(self):
        with pytest.raises(ValueError, match="k must be"):
            tilted("norm", k=0.0)
        with pytest.raises(ValueError, match="k must be"):
            tilted("norm", k=float("inf"))
        with pytest.raises(ValueError, match="tail must be"):
            tilted("norm", k=2.0, tail="mid")

    def test_deep_tilt_warnings(self):
        import warnings

        # Upper tail beyond the f32 grid near u = 1: silent-bias hazard.
        with pytest.warns(UserWarning, match="below the float32 grid"):
            tilted("norm", k=2.0**25, tail="upper")
        # Non-wide family at depths its standard kernel cannot resolve.
        with pytest.warns(UserWarning, match="no deep-tail ppf kernel"):
            tilted("t", k=2.0**25, tail="lower", df=5)
        # Wide-family lower tilts at any depth are fine: no warning.
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            tilted("norm", k=2.0**30, tail="lower")
            tilted("lognorm", k=2.0**30, tail="lower", s=0.5)
            tilted("t", k=100.0, tail="lower", df=5)  # shallow: fine

    def test_depth_variable_is_exponential(self):
        # The lower tilt's proposal depth a = -log(1-V) is built from
        # TWO stacked uniforms (48-bit-deep 1-V); recover a from the
        # weight node (w = exp(a (k-1)/k) / k) and KS-test it against
        # Exp(1) — validating the stacked-uniform law end to end.
        k = 64.0
        _, w = tilted("norm", k=k, tail="lower")
        ws = np.asarray(w.sample(2**16, random_state=7), np.float64)
        a = np.log(ws * k) * k / (k - 1.0)
        assert a.min() > 0.0
        ks = scipy.stats.kstest(a, "expon")
        assert ks.pvalue > 1e-3, (ks, a.mean(), a.max())


class TestWideKernels:
    def test_ndtri_wide_deep_tail_accuracy(self):
        import jax.numpy as jnp
        import scipy.special

        from probabilit_tpu.ops import special

        for u in (1e-8, 1e-9, 1e-12, 1e-20, 1e-30, 1e-37):
            ours = float(special.ndtri_fast_wide(jnp.float32(u)))
            exact = float(scipy.special.ndtri(u))
            # |dx| < 1e-4 keeps implied tail-probability bias < 0.1%.
            assert abs(ours - exact) < 1e-4, u

    def test_quantile_transform_resolves_below_rng_grid(self):
        # A constant quantile far below 2^-24 must NOT saturate at the
        # RNG-grid clamp (ndtri(2^-24) = -5.29).
        from probabilit_tpu.models.distributions import (
            Distribution,
            QuantileTransform,
        )

        u = Distribution("uniform") * 0.0 + 1e-12
        x = QuantileTransform(u, "norm")
        out = np.asarray(x.sample(8, random_state=0))
        np.testing.assert_allclose(out, scipy.stats.norm.ppf(1e-12), atol=1e-4)
