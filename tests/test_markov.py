"""Markov chains and regime-switching GBM (models/markov.py).

Framework extension (no counterpart in the reference).  The chain is an
exact grid process, so tests pin marginals against matrix powers of the
transition matrix and the regime-switching asset against closed-form
lognormal laws in the degenerate (identity / deterministic-cycling)
regimes, plus the path-node plumbing contracts.
"""

import numpy as np
import pytest
from scipy import stats

from probabilit_tpu import MarkovChain, RegimeSwitchingGBM

P2 = [[0.9, 0.1], [0.3, 0.7]]


class TestMarkovChain:
    def test_marginal_matches_matrix_power(self):
        chain = MarkovChain(P2, x0=0, steps=16)
        for k in (0, 3, 10):
            s = np.asarray(chain.at(k).sample(40000, random_state=k))
            want = (np.linalg.matrix_power(np.asarray(P2), k + 1))[0]
            freq = np.array([(s == j).mean() for j in range(2)])
            np.testing.assert_allclose(freq, want, atol=0.01)

    def test_three_state_stationary_occupancy(self):
        P = [[0.8, 0.15, 0.05], [0.2, 0.7, 0.1], [0.1, 0.3, 0.6]]
        chain = MarkovChain(P, x0=0, steps=400)
        occ = np.asarray(chain.average().sample(4000, random_state=1))
        # Stationary distribution from the left eigenvector.
        w, v = np.linalg.eig(np.asarray(P).T)
        pi = np.real(v[:, np.argmax(np.real(w))])
        pi = pi / pi.sum()
        want = float(pi @ np.arange(3))
        assert occ.mean() == pytest.approx(want, abs=0.02)

    def test_custom_state_values(self):
        chain = MarkovChain(P2, x0=1, values=[-1.0, 2.5], steps=8)
        s = np.asarray(chain.terminal().sample(20000, random_state=2))
        assert set(np.unique(s)) == {-1.0, 2.5}
        p_state1 = (np.linalg.matrix_power(np.asarray(P2), 8))[1, 1]
        assert (s == 2.5).mean() == pytest.approx(p_state1, abs=0.01)

    def test_sobol_streamed_bitwise(self):
        from probabilit_tpu.engine import streaming

        chain = MarkovChain(P2, x0=0, steps=8)
        t = chain.average()
        full = np.asarray(t.sample(512, random_state=3, method="sobol"))
        blocks = streaming.sample_streaming(
            t, 512, block_size=128, random_state=3, method="sobol"
        )
        np.testing.assert_array_equal(full, np.asarray(blocks))

    def test_validation(self):
        with pytest.raises(ValueError, match="square"):
            MarkovChain([[0.5, 0.5]])
        with pytest.raises(ValueError, match="sum to 1"):
            MarkovChain([[0.9, 0.2], [0.3, 0.7]])
        with pytest.raises(ValueError, match="non-negative"):
            MarkovChain([[1.1, -0.1], [0.3, 0.7]])
        with pytest.raises(ValueError, match="x0"):
            MarkovChain(P2, x0=2)
        with pytest.raises(ValueError, match="values"):
            MarkovChain(P2, values=[1.0])


class TestRegimeSwitchingGBM:
    def test_identity_transition_is_plain_gbm(self):
        # P = I freezes the regime: the asset is exactly GBM in state 0.
        g = RegimeSwitchingGBM(
            100.0, [0.05, -0.5], [0.2, 0.9], [[1.0, 0.0], [0.0, 1.0]],
            x0_state=0, T=1.0, steps=16,
        )
        s = np.asarray(g.terminal().sample(20000, random_state=0))
        scale = 100.0 * np.exp(0.05 - 0.5 * 0.04)
        assert stats.kstest(s[:8000], "lognorm", args=(0.2, 0.0, scale)).pvalue > 0.01

    def test_deterministic_alternation_closed_form(self):
        # P = [[0,1],[1,0]] alternates regimes every interval, starting
        # from the state at interval 0's left endpoint (= x0_state):
        # log S_T is normal with summed interval means/variances.
        mu, sd = np.array([0.1, -0.05]), np.array([0.15, 0.45])
        steps = 8
        g = RegimeSwitchingGBM(
            1.0, mu, sd, [[0.0, 1.0], [1.0, 0.0]], x0_state=1, T=1.0,
            steps=steps,
        )
        s = np.log(np.asarray(g.terminal().sample(20000, random_state=1)))
        dt = 1.0 / steps
        seq = np.array([1, 0] * (steps // 2))  # left-endpoint states
        m = np.sum((mu[seq] - 0.5 * sd[seq] ** 2) * dt)
        v = np.sum(sd[seq] ** 2 * dt)
        assert stats.kstest(s[:8000], "norm", args=(m, np.sqrt(v))).pvalue > 0.01

    def test_regime_mixing_fattens_tails(self):
        # Occasional high-vol regimes produce excess kurtosis vs the
        # matched single-regime GBM.
        kw = dict(T=1.0, steps=64)
        mixed = RegimeSwitchingGBM(
            1.0, [0.05, 0.05], [0.1, 0.5], [[0.95, 0.05], [0.2, 0.8]], **kw
        )
        single = RegimeSwitchingGBM(
            1.0, [0.05, 0.05], [0.1, 0.1], [[1.0, 0.0], [0.0, 1.0]], **kw
        )
        lm = np.log(np.asarray(mixed.terminal().sample(30000, random_state=2)))
        ls = np.log(np.asarray(single.terminal().sample(30000, random_state=3)))
        assert stats.kurtosis(lm) > stats.kurtosis(ls) + 0.5

    def test_sobol_mesh_invariance(self):
        from probabilit_tpu.parallel import make_mesh, use_mesh

        g = RegimeSwitchingGBM(
            100.0, [0.08, -0.02], [0.15, 0.4], P2, steps=8
        )
        payoff = (g.minimum() > 70) * g.terminal()
        base = np.asarray(payoff.sample(2048, random_state=5, method="sobol"))
        with use_mesh(make_mesh()):
            sharded = np.asarray(payoff.sample(2048, random_state=5, method="sobol"))
        np.testing.assert_array_equal(base, sharded)

    def test_validation(self):
        with pytest.raises(ValueError, match="s0"):
            RegimeSwitchingGBM(0.0, [0.1, 0.1], [0.2, 0.2], P2)
        with pytest.raises(ValueError, match="shape"):
            RegimeSwitchingGBM(1.0, [0.1], [0.2, 0.2], P2)
        with pytest.raises(ValueError, match="sigma"):
            RegimeSwitchingGBM(1.0, [0.1, 0.1], [0.2, 0.0], P2)
        with pytest.raises(ValueError, match="x0_state"):
            RegimeSwitchingGBM(1.0, [0.1, 0.1], [0.2, 0.2], P2, x0_state=5)
