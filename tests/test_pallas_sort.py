"""Unit tests for the Pallas blocked bitonic sort (ops/pallas_sort.py).

All tests run the kernels in interpret mode (pure jnp semantics, exact
on CPU); the chip-throughput measurement lives in
tools/bench_pallas_sort.py and its results in BASELINE.md.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from probabilit_tpu.ops import pallas_sort as ps


class TestSortRuns:
    def test_alternating_directions_and_payload(self):
        rng = np.random.default_rng(0)
        R = 4
        k = rng.normal(size=(R, 64, 128)).astype(np.float32)
        p = np.arange(R * 64 * 128, dtype=np.int32).reshape(R, 64, 128)
        ks, pss = ps.sort_runs(jnp.asarray(k), jnp.asarray(p), interpret=True)
        ks, pss = np.asarray(ks), np.asarray(pss)
        for g in range(R):
            flat = ks[g].reshape(-1)
            want = np.sort(k[g].reshape(-1))
            if g % 2 == 1:
                want = want[::-1]
            np.testing.assert_array_equal(flat, want)
            # Payload integrity: the carried index points at the key.
            orig = k[g].reshape(-1)[pss[g].reshape(-1) - g * 64 * 128]
            np.testing.assert_array_equal(orig, flat)

    def test_duplicate_keys_keep_pairing(self):
        rng = np.random.default_rng(1)
        k = rng.integers(0, 50, size=(2, 64, 128)).astype(np.float32)
        p = np.arange(2 * 64 * 128, dtype=np.int32).reshape(2, 64, 128)
        ks, pss = ps.sort_runs(jnp.asarray(k), jnp.asarray(p), interpret=True)
        ks, pss = np.asarray(ks), np.asarray(pss)
        for g in range(2):
            flat = ks[g].reshape(-1)
            want = np.sort(k[g].reshape(-1))
            if g % 2 == 1:
                want = want[::-1]
            np.testing.assert_array_equal(flat, want)
            orig = k[g].reshape(-1)[pss[g].reshape(-1) - g * 64 * 128]
            np.testing.assert_array_equal(orig, flat)


class TestBitonicSortRows:
    @pytest.mark.parametrize("N", [8192, 16384, 40000, 100_000])
    def test_sorted_and_paired(self, N):
        rng = np.random.default_rng(N)
        K = 3
        keys = rng.normal(size=(K, N)).astype(np.float32)
        payload = np.tile(np.arange(N, dtype=np.int32), (K, 1))
        sk, sp = ps.bitonic_sort_rows(
            jnp.asarray(keys), jnp.asarray(payload), interpret=True
        )
        sk, sp = np.asarray(sk), np.asarray(sp)
        assert sk.shape == (K, N)
        for r in range(K):
            np.testing.assert_array_equal(sk[r], np.sort(keys[r]))
            # Marginal preservation: the output is a permutation of the
            # input row, located by the carried payload.
            np.testing.assert_array_equal(keys[r][sp[r]], sk[r])

    def test_int32_permutation_keys(self):
        # The Iman-Conover "unsort" sorts an i32 permutation key with an
        # f32 payload; integer compares must be exact.
        rng = np.random.default_rng(7)
        N = 40000
        perm = np.stack([rng.permutation(N), rng.permutation(N)]).astype(
            np.int32
        )
        vals = rng.normal(size=(2, N)).astype(np.float32)
        sk, sp = ps.bitonic_sort_rows(
            jnp.asarray(perm), jnp.asarray(vals), interpret=True
        )
        sk, sp = np.asarray(sk), np.asarray(sp)
        for r in range(2):
            np.testing.assert_array_equal(sk[r], np.arange(N))
            # sort by perm: payload lands at its perm position.
            want = np.empty(N, np.float32)
            want[perm[r]] = vals[r]
            np.testing.assert_array_equal(sp[r], want)
