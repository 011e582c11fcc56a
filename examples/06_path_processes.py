"""Path-dependent Monte Carlo: barrier option pricing with error bars.

Prices an up-and-out call on a geometric Brownian motion — a payoff
that depends on the WHOLE path, not just the terminal value — and shows
the estimator toolkit stacking:

* exact-law path nodes (no Euler discretisation error at the grid),
* streamed estimation with a valid standard error,
* antithetic pairing and randomised-QMC replicates shrinking that error
  at identical cost.

Run: python examples/06_path_processes.py
"""

import numpy as np

from probabilit_tpu import GeometricBrownianMotion
from probabilit_tpu.engine import streaming

S0, K, BARRIER = 100.0, 100.0, 130.0
MU, SIGMA, T = 0.03, 0.2, 1.0
N = 2**19  # paths per estimate; 252 steps each


def build_payoff():
    gbm = GeometricBrownianMotion(s0=S0, mu=MU, sigma=SIGMA, T=T, steps=252)
    alive = gbm.maximum() < BARRIER  # knocked out if the barrier is hit
    call = gbm.terminal() - K
    return alive * (call > 0) * call * np.exp(-MU * T)


def main():
    payoff = build_payoff()
    block = 2**16  # 2^16 paths x 252 steps x 4 B ~ 66 MB per block

    plain = streaming.estimate(payoff, N, block_size=block, random_state=0)
    anti = streaming.estimate(
        payoff, N, block_size=block, random_state=0, method="antithetic",
        replicates=8,
    )
    rqmc = streaming.estimate(
        payoff, N, block_size=block, random_state=0, method="sobol",
        replicates=8,
    )

    print(f"up-and-out call, S0={S0:g} K={K:g} barrier={BARRIER:g}")
    print(f"  plain MC     : {plain['mean']:.4f} +/- {plain['sem']:.4f}")
    print(f"  antithetic x8: {anti['mean']:.4f} +/- {anti['sem']:.4f}")
    print(f"  sobol RQMC x8: {rqmc['mean']:.4f} +/- {rqmc['sem']:.4f}")
    print("  (same draw budget each; the error bars are the story)")

    # Knock-out probability and a tail profile of the undiscounted payoff.
    gbm = GeometricBrownianMotion(s0=S0, mu=MU, sigma=SIGMA, T=T, steps=252)
    knocked = streaming.estimate(
        (gbm.maximum() >= BARRIER) * 1.0, N, block_size=block, random_state=1
    )
    print(f"  P(knock-out) : {knocked['mean']:.4f} +/- {knocked['sem']:.4f}")


if __name__ == "__main__":
    main()
