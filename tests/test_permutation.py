"""Permutation correlator subsystem tests.

Mirrors reference tests/test_permutation_correlator.py: incremental
CorrelationMatrix updates equal full recomputation (pearson + spearman,
single and batched swaps, undo-idempotence), SwapIndexGenerator
disjointness, PermutationCorrelator convergence over seeds.
"""

import numpy as np
import pytest
import scipy.stats

from probabilit_tpu.correlation import (
    CorrelationMatrix,
    ImanConover,
    PermutationCorrelator,
    SwapIndexGenerator,
)


def _spearman(X):
    return np.corrcoef(
        np.apply_along_axis(scipy.stats.rankdata, 0, X), rowvar=False
    )


class TestSwapIndexGenerator:
    @pytest.mark.parametrize("seed", range(20))
    def test_disjoint_indices(self, seed):
        rng = np.random.default_rng(seed)
        gen = SwapIndexGenerator(rng=rng, n=17)
        for size in [1, 2, 3, 5, 8, 100]:
            i, j = gen(size)
            assert len(i) == len(j)
            assert len(set(i.tolist()) & set(j.tolist())) == 0
            assert len(i) <= 17 // 2

    def test_reshuffles_when_exhausted(self, rng):
        gen = SwapIndexGenerator(rng=rng, n=6)
        for _ in range(10):  # Far more draws than one permutation supports
            i, j = gen(3)
            assert len(i) == 3


class TestCorrelationMatrix:
    @pytest.mark.parametrize("seed", range(50))
    @pytest.mark.parametrize("corr_type", ["pearson", "spearman"])
    def test_update_matches_recomputation(self, seed, corr_type):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(30, 5))
        cm = CorrelationMatrix(X, correlation_type=corr_type)
        col = int(rng.integers(0, 5))
        i, j = SwapIndexGenerator(rng=rng, n=30)(int(rng.integers(1, 5)))

        new_col = cm.update_column(col=col, i=i, j=j)
        cm.commit(col=col, i=i, j=j)

        X_swapped = X.copy()
        X_swapped[i, col], X_swapped[j, col] = X[j, col], X[i, col]
        if corr_type == "pearson":
            expected = np.corrcoef(X_swapped, rowvar=False)
        else:
            expected = _spearman(X_swapped)
        np.testing.assert_allclose(new_col, expected[:, col], atol=1e-12)
        np.testing.assert_allclose(cm[:, :], expected, atol=1e-12)

    @pytest.mark.parametrize("seed", range(10))
    def test_swap_undo_idempotent(self, seed):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(20, 4))
        cm = CorrelationMatrix(X)
        original = cm[:, :].copy()
        cm.commit(col=1, i=[2, 5], j=[7, 11])
        cm.commit(col=1, i=[2, 5], j=[7, 11])  # Swap back
        np.testing.assert_allclose(cm[:, :], original, atol=1e-12)
        np.testing.assert_allclose(cm.X, X, atol=1e-12)

    def test_numerator_stays_consistent_after_commit(self, rng):
        # numerator is stored as (centered.T @ centered) / m; commit must
        # keep it in those units (the reference adds the raw sum-delta,
        # corrupting its numerator by ~m on changed entries).
        X = rng.normal(size=(15, 3))
        cm = CorrelationMatrix(X)
        cm.commit(col=0, i=[1, 4], j=[2, 9])
        Xs = cm.X_
        centered = Xs - Xs.mean(axis=0)
        np.testing.assert_allclose(
            cm.numerator, centered.T @ centered / cm.m, atol=1e-12
        )

    def test_disjointness_enforced(self, rng):
        cm = CorrelationMatrix(rng.normal(size=(10, 3)))
        with pytest.raises(ValueError, match="disjoint"):
            cm._delta_numerator(0, [1, 2], [2, 3])

    def test_constant_column_rejected(self):
        X = np.ones((10, 2))
        X[:, 0] = np.arange(10)
        with pytest.raises(ValueError, match="constant"):
            CorrelationMatrix(X)

    def test_single_swap_equals_batched(self, rng):
        X = rng.normal(size=(25, 3))
        cm1 = CorrelationMatrix(X)
        cm1.commit(col=0, i=[1], j=[2])
        cm1.commit(col=0, i=[3], j=[4])
        cm2 = CorrelationMatrix(X)
        cm2.commit(col=0, i=[1, 3], j=[2, 4])
        np.testing.assert_allclose(cm1[:, :], cm2[:, :], atol=1e-12)


class TestPermutationCorrelator:
    @pytest.mark.parametrize("seed", range(10))
    def test_convergence(self, seed):
        rng = np.random.default_rng(seed)
        X = rng.normal(size=(100, 3))
        C = np.array([[1, 0.6, 0.3], [0.6, 1, 0.5], [0.3, 0.5, 1]])
        pc = PermutationCorrelator(seed=seed, iterations=300, tol=0.01)
        Xt = np.asarray(pc.set_target(C)(X))
        err = np.sqrt(np.sum((np.corrcoef(Xt, rowvar=False) - C)[np.triu_indices(3, 1)] ** 2))
        assert err < 0.1

    def test_improves_when_fewer_rows_than_columns(self):
        # Regression (reference test_permutation_correlator.py:173-185):
        # with 5 rows the schedule proposes up to 11 swap pairs, and
        # rejection-drawn pairs collided on every draw — the climb
        # silently proposed nothing and never improved.  Small inputs
        # now draw pairs from a shuffled permutation (exactly disjoint).
        rng = np.random.default_rng(42)
        X = rng.normal(size=(5, 10))
        target = np.identity(10)
        pc = PermutationCorrelator(seed=0).set_target(target)
        Xt = np.asarray(pc(X))
        before = pc._error(np.corrcoef(X, rowvar=False), target)
        after = pc._error(np.corrcoef(Xt, rowvar=False), target)
        assert after < before
        for j in range(10):
            np.testing.assert_allclose(
                np.sort(Xt[:, j]), np.sort(X[:, j]), atol=1e-6
            )

    def test_marginals_preserved(self, rng):
        X = rng.exponential(size=(80, 2))
        C = np.array([[1, 0.5], [0.5, 1]])
        pc = PermutationCorrelator(seed=0, iterations=200)
        Xt = np.asarray(pc.set_target(C)(X))
        for k in range(2):
            np.testing.assert_allclose(np.sort(Xt[:, k]), np.sort(X[:, k]), rtol=1e-6)

    def test_spearman_mode(self, rng):
        X = rng.lognormal(size=(150, 2))
        C = np.array([[1, 0.6], [0.6, 1]])
        pc = PermutationCorrelator(
            seed=1, iterations=400, correlation_type="spearman", tol=0.02
        )
        Xt = np.asarray(pc.set_target(C)(X))
        achieved = _spearman(Xt)[0, 1]
        assert np.isclose(achieved, 0.6, atol=0.1)
        for k in range(2):
            np.testing.assert_allclose(np.sort(Xt[:, k]), np.sort(X[:, k]), rtol=1e-6)

    def test_refines_iman_conover(self, rng):
        variables = 8
        C = np.ones((variables, variables)) * 0.5
        np.fill_diagonal(C, 1.0)
        X = rng.normal(size=(10 * variables, variables))
        X_ic = np.asarray(ImanConover().set_target(C)(X))
        pc = PermutationCorrelator(seed=0, iterations=150, tol=1e-8)
        pc = pc.set_target(C)
        err_ic = pc._error(np.corrcoef(X_ic, rowvar=False), C)
        X_pc = np.asarray(pc(X_ic))
        err_pc = pc._error(np.corrcoef(X_pc, rowvar=False), C)
        assert err_pc <= err_ic + 1e-12

    def test_iterations_zero_runs_to_tolerance(self):
        # Reference semantics (correlation.py:493-495): iterations=0 is
        # UNBOUNDED — the loop exits only on tolerance.  A loose target
        # with an achievable tolerance must terminate and reach it.
        rng = np.random.default_rng(3)
        X = rng.normal(size=(200, 2))
        C = np.array([[1, 0.4], [0.4, 1]])
        pc = PermutationCorrelator(seed=2, iterations=0, tol=0.02)
        Xt = np.asarray(pc.set_target(C)(X))
        achieved = np.corrcoef(Xt, rowvar=False)[0, 1]
        # err = sqrt(w * diff^2) with normalized weights w = 1/4 at K=2,
        # so tol=0.02 bounds the raw correlation gap by 0.04.
        assert abs(achieved - 0.4) < 0.04 + 1e-6
        np.testing.assert_allclose(np.sort(Xt[:, 0]), np.sort(X[:, 0]), rtol=1e-6)

    def test_unbounded_nan_error_returns_unchanged(self):
        # A constant column makes every correlation NaN; the unbounded
        # host loop must fall through like the reference's
        # `while error >= tol` (review r3: `err < tol` kept dispatching
        # no-op chunks until the 2^31 safety valve).
        from probabilit_tpu.ops.permutation import PermutationCorrelator

        X = np.column_stack([np.ones(64), np.arange(64.0)]).astype(np.float32)
        pc = PermutationCorrelator(iterations=0, tol=1e-3, seed=0)
        pc.set_target(np.array([[1.0, 0.5], [0.5, 1.0]]))
        with pytest.warns(UserWarning, match="NaN"):
            out = np.asarray(pc(X))
        np.testing.assert_array_equal(out, X)

    def test_verbose_progress_lines(self, capfd):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(50, 2))
        C = np.array([[1, 0.5], [0.5, 1]])
        pc = PermutationCorrelator(seed=0, iterations=100, tol=1e-9, verbose=True)
        pc.set_target(C)(X)
        import jax

        jax.effects_barrier()  # flush pending debug.print callbacks
        out = capfd.readouterr().out
        assert "Running permutation correlator for 100 iterations." in out
        assert " Iter " in out and "Swaps:" in out
        assert "finished" in out

    def test_subiters_schedule(self):
        # Halving pattern: second half of iterations uses batch size 1.
        assert PermutationCorrelator.subiters(1000, 1000) == 1
        assert PermutationCorrelator.subiters(1000, 600) == 1
        assert PermutationCorrelator.subiters(1000, 1) > 1

    def test_validation(self):
        with pytest.raises(ValueError):
            PermutationCorrelator(weights=np.array([[1.0, -1.0], [1.0, 1.0]]))
        with pytest.raises(ValueError):
            PermutationCorrelator(iterations=-1)
        with pytest.raises(TypeError):
            PermutationCorrelator(seed=1.5)
