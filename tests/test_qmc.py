"""QMC sequence tests: validity, stratification, variance reduction."""

import jax
import numpy as np
import pytest

from probabilit_tpu.ops import qmc


class TestLatinHypercube:
    def test_stratification(self):
        # Exactly one point per 1/n stratum per dimension.
        n, d = 64, 5
        pts = np.asarray(qmc.latin_hypercube(jax.random.PRNGKey(0), n, d))
        assert pts.shape == (n, d)
        for j in range(d):
            strata = np.floor(pts[:, j] * n).astype(int)
            assert sorted(strata.tolist()) == list(range(n))

    def test_range(self):
        pts = np.asarray(qmc.latin_hypercube(jax.random.PRNGKey(1), 100, 3))
        assert pts.min() >= 0.0 and pts.max() < 1.0

    @pytest.mark.parametrize("n", [1, 2, 3, 63, 64, 65, 1000, 4097])
    def test_feistel_bijective_at_awkward_sizes(self, n):
        # Cycle-walking must yield a permutation of [0, n) for any n,
        # not just powers of two.
        import jax.numpy as jnp

        rk = jax.random.bits(
            jax.random.PRNGKey(n), (qmc._FEISTEL_ROUNDS,), dtype=jnp.uint32
        )
        out = np.asarray(
            qmc._feistel_permutation(jnp.arange(n, dtype=jnp.uint32), rk, n)
        )
        assert sorted(out.tolist()) == list(range(n))

    def test_offset_blocks_are_slices(self):
        # Index addressability: any block reproduces the global slice.
        full = np.asarray(qmc.latin_hypercube(jax.random.PRNGKey(2), 100, 3))
        lo = np.asarray(
            qmc.latin_hypercube(jax.random.PRNGKey(2), 40, 3, offset=0, total=100)
        )
        hi = np.asarray(
            qmc.latin_hypercube(jax.random.PRNGKey(2), 60, 3, offset=40, total=100)
        )
        np.testing.assert_array_equal(full, np.vstack([lo, hi]))

    def test_full_uint32_domain_boundary(self):
        # total=2^32 is the advertised streaming cap: the Feistel network
        # is a bijection of the full domain (no walk, no uint32 overflow).
        import jax.numpy as jnp

        rk = jax.random.bits(
            jax.random.PRNGKey(0), (qmc._FEISTEL_ROUNDS,), dtype=jnp.uint32
        )
        idx = jnp.asarray([0, 1, 2**31, 2**32 - 1], jnp.uint32)
        out = np.asarray(qmc._feistel_permutation(idx, rk, 1 << 32))
        assert out.dtype == np.uint32 and len(set(out.tolist())) == 4
        with pytest.raises(ValueError, match="2\\^32"):
            qmc._feistel_permutation(idx, rk, (1 << 32) + 1)
        # And through the public generator path (one small block of a
        # 2^32-point stratification).
        pts = np.asarray(
            qmc.latin_hypercube(
                jax.random.PRNGKey(1), 64, 2, offset=2**31, total=1 << 32
            )
        )
        assert pts.shape == (64, 2) and 0.0 < pts.min() and pts.max() < 1.0

    def test_out_of_domain_padding_rows_terminate(self):
        # Regression (review r3): indices past `total` (the padding rows
        # of a partial final block) can lie on Feistel cycles entirely
        # inside [total, 2^m); cycle-walking them spun the compiled
        # while_loop forever for ~4% of keys.  PRNGKey(8) at n=1024,
        # total=1000 reproduced the hang before the fix.
        pts = np.asarray(
            qmc.latin_hypercube(jax.random.PRNGKey(8), 1024, 1, total=1000)
        )
        assert pts.shape == (1024, 1)
        assert np.all(np.isfinite(pts)) and np.all((0 <= pts) & (pts < 1))
        # The 1000 in-domain rows still form the exact stratification.
        strata = np.floor(pts[:1000, 0] * 1000).astype(int)
        assert sorted(strata.tolist()) == list(range(1000))

    def test_different_keys_differ(self):
        p1 = np.asarray(qmc.latin_hypercube(jax.random.PRNGKey(0), 64, 2))
        p2 = np.asarray(qmc.latin_hypercube(jax.random.PRNGKey(9), 64, 2))
        assert not np.allclose(p1, p2)

    def test_jitter_uniform_within_strata(self):
        # The murmur-mixed jitter should fill strata uniformly: KS test
        # of (pts * n) mod 1 against U(0,1).
        import scipy.stats

        n = 4096
        pts = np.asarray(qmc.latin_hypercube(jax.random.PRNGKey(4), n, 1))
        frac = (pts[:, 0] * n) % 1.0
        assert scipy.stats.kstest(frac, "uniform").pvalue > 0.01


class TestSobol:
    def test_range_and_shape(self):
        pts = np.asarray(qmc.sobol(jax.random.PRNGKey(0), 256, 10))
        assert pts.shape == (256, 10)
        assert pts.min() >= 0.0 and pts.max() < 1.0

    def test_unscrambled_first_dim_is_van_der_corput(self):
        pts = np.asarray(qmc.sobol(jax.random.PRNGKey(0), 8, 1, scramble=False))
        expected = np.array([0.0, 0.5, 0.75, 0.25, 0.375, 0.875, 0.625, 0.125])
        np.testing.assert_allclose(pts[:, 0], expected, atol=1e-6)

    def test_equidistribution_base2(self):
        # Every dimension of the first 2^m points hits each 1/2^k bin
        # exactly 2^(m-k) times (digital net property).
        n = 128
        pts = np.asarray(qmc.sobol(jax.random.PRNGKey(3), n, 8))
        for j in range(8):
            counts = np.bincount(np.floor(pts[:, j] * 16).astype(int), minlength=16)
            np.testing.assert_array_equal(counts, n // 16)

    def test_scrambling_randomises(self):
        p1 = np.asarray(qmc.sobol(jax.random.PRNGKey(0), 64, 4))
        p2 = np.asarray(qmc.sobol(jax.random.PRNGKey(1), 64, 4))
        assert not np.allclose(p1, p2)

    def test_offset_blocks_are_disjoint_slices(self):
        # Chip k computing [offset, offset+n) must reproduce the global slice.
        full = np.asarray(qmc.sobol(jax.random.PRNGKey(0), 64, 3))
        lo = np.asarray(qmc.sobol(jax.random.PRNGKey(0), 32, 3, offset=0))
        hi = np.asarray(qmc.sobol(jax.random.PRNGKey(0), 32, 3, offset=32))
        np.testing.assert_allclose(full, np.vstack([lo, hi]), atol=1e-7)

    def test_offset_above_int31_wraps_not_crashes(self):
        # Host ints >= 2^31 overflow JAX's int32 argument coercion unless
        # wrapped to uint32 first (review r3: sobol advertises 2^32-point
        # streams but crashed at the top half).
        pts = np.asarray(qmc.sobol(jax.random.PRNGKey(0), 8, 2, offset=2**31))
        assert pts.shape == (8, 2) and 0.0 <= pts.min() and pts.max() < 1.0
        via_generate = np.asarray(
            qmc.generate("sobol", jax.random.PRNGKey(0), 8, 2, offset=2**31)
        )
        np.testing.assert_array_equal(pts, via_generate)

    def test_integration_beats_pseudo_random(self):
        # Estimate E[prod(x)] on [0,1]^4 = 1/16; Sobol error should beat MC.
        n, d = 1024, 4
        sob = np.asarray(qmc.sobol(jax.random.PRNGKey(0), n, d, dtype=np.float32))
        mc = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (n, d)))
        err_sob = abs(np.prod(sob, axis=1).mean() - 1 / 16)
        err_mc = abs(np.prod(mc, axis=1).mean() - 1 / 16)
        assert err_sob < err_mc


class TestHalton:
    def test_unscrambled_prefix(self):
        pts = np.asarray(qmc.halton(jax.random.PRNGKey(0), 4, 2, scramble=False))
        np.testing.assert_allclose(pts[:, 0], [0, 0.5, 0.25, 0.75], atol=1e-6)
        np.testing.assert_allclose(pts[:, 1], [0, 1 / 3, 2 / 3, 1 / 9], atol=1e-6)

    def test_scrambled_in_range(self):
        pts = np.asarray(qmc.halton(jax.random.PRNGKey(5), 200, 6))
        assert pts.min() >= 0.0 and pts.max() < 1.0
        assert np.allclose(pts.mean(axis=0), 0.5, atol=0.06)

    def test_offset_above_index_cap_raises(self):
        # Halton's digit loop is signed-index: wrapping would silently
        # repeat earlier points, so the cap is a clear host-side error.
        with pytest.raises(ValueError, match="int32-indexed"):
            qmc.halton(jax.random.PRNGKey(0), 8, 2, offset=2**31)


class TestAntithetic:
    def test_rows_pair_and_reflect(self):
        q = np.asarray(qmc.antithetic(jax.random.PRNGKey(0), 64, 4))
        assert q.shape == (64, 4)
        assert q.min() > 0.0 and q.max() < 1.0
        # Row 2k+1 is the reflection of row 2k (up to the open-interval
        # clamp, one 2^-24 ulp at the endpoints).
        np.testing.assert_allclose(q[1::2], 1.0 - q[0::2], atol=3e-7)

    def test_offset_blocks_are_slices(self):
        # Index addressability incl. an offset that splits a pair.
        full = np.asarray(qmc.antithetic(jax.random.PRNGKey(3), 100, 3))
        a = np.asarray(qmc.antithetic(jax.random.PRNGKey(3), 37, 3, offset=0))
        b = np.asarray(qmc.antithetic(jax.random.PRNGKey(3), 63, 3, offset=37))
        np.testing.assert_array_equal(full, np.vstack([a, b]))

    def test_column_means_exact(self):
        # Pairs sum to exactly 1, so even-count column means are 0.5 to
        # float rounding — the signature antithetic property.
        q = np.asarray(qmc.antithetic(jax.random.PRNGKey(7), 4096, 5))
        np.testing.assert_allclose(q.mean(axis=0), 0.5, atol=1e-6)

    def test_monotone_model_variance_collapse(self):
        # The normal ppf is odd-symmetric about q=0.5 and the uniform ppf
        # is linear, so each antithetic pair of (norm + uniform) averages
        # to the true mean up to kernel round-trip error: the estimator
        # error at n=4096 is orders of magnitude below the iid MC
        # sigma/sqrt(n) ~ 0.017.
        from probabilit_tpu.modeling import Distribution

        model = Distribution("norm") + Distribution("uniform")
        s = np.asarray(model.sample(4096, random_state=11, method="antithetic"))
        assert abs(s.mean() - 0.5) < 1e-4

    def test_different_keys_differ(self):
        a = np.asarray(qmc.antithetic(jax.random.PRNGKey(0), 32, 2))
        b = np.asarray(qmc.antithetic(jax.random.PRNGKey(1), 32, 2))
        assert not np.array_equal(a, b)


class TestMethodPlumbing:
    @pytest.mark.parametrize("method", ["lhs", "halton", "sobol", "antithetic"])
    def test_sample_method_argument(self, method):
        from probabilit_tpu.modeling import Distribution

        s = np.asarray(
            Distribution("uniform").sample(128, random_state=0, method=method)
        )
        assert s.shape == (128,)
        assert np.isclose(s.mean(), 0.5, atol=0.05)

    def test_unknown_method_raises(self):
        from probabilit_tpu.modeling import Distribution

        with pytest.raises(KeyError):
            Distribution("uniform").sample(10, random_state=0, method="bogus")

    def test_qmc_improves_mean_estimate(self):
        from probabilit_tpu.modeling import Distribution

        # LHS stratification: uniform mean estimate is near-exact.
        s = np.asarray(
            Distribution("uniform").sample(256, random_state=0, method="lhs")
        )
        assert abs(s.mean() - 0.5) < 0.002


class TestOrderStatistics:
    def test_sorted_and_uniform(self):
        import jax

        from probabilit_tpu.ops.orderstats import sorted_uniforms

        u = np.asarray(sorted_uniforms(jax.random.PRNGKey(0), 3, 50_000))
        assert u.shape == (3, 50_000)
        # Rows sorted and strictly inside (0, 1)
        assert (np.diff(u, axis=1) >= 0).all()
        assert u.min() > 0 and u.max() < 1
        # Each row is distributed as U(0,1) order statistics = a sorted
        # uniform sample: KS against the uniform CDF.
        import scipy.stats

        for row in u:
            assert scipy.stats.kstest(row, "uniform").pvalue > 1e-3

    def test_exact_count_boundaries(self):
        import jax

        from probabilit_tpu.ops.orderstats import sorted_uniforms

        # n exactly at and around the block size
        for n in [1, 2, 4095, 4096, 4097]:
            u = np.asarray(sorted_uniforms(jax.random.PRNGKey(1), 1, n))
            assert u.shape == (1, n)
            assert (np.diff(u[0]) >= 0).all()


class TestSobolQuality:
    def test_matches_scipy_joe_kuo_integration_error(self):
        """Generated direction numbers + Owen hash scrambling reach the
        same integration quality as scipy's Joe-Kuo Sobol (measured RMS
        0.0168 vs 0.0177 on this problem; pseudo-random: 0.071)."""
        import scipy.stats.qmc as sq

        d, n = 10, 4096
        errs_ours, errs_scipy = [], []
        for seed in range(10):
            ours = np.asarray(qmc.sobol(jax.random.PRNGKey(seed), n, d))
            sp = sq.Sobol(d=d, seed=seed).random(n)
            f = lambda x: np.prod(2 * x, axis=1).mean()
            errs_ours.append((f(ours) - 1.0) ** 2)
            errs_scipy.append((f(sp) - 1.0) ** 2)
        rms_ours = np.sqrt(np.mean(errs_ours))
        rms_scipy = np.sqrt(np.mean(errs_scipy))
        assert rms_ours < 2.0 * rms_scipy
