"""Path-dependent Monte Carlo: barrier and Asian option pricing.

Everything runs on exact-law GBM path nodes (no Euler discretisation
error at the grid) through streamed estimation:

* an up-and-out barrier call with replicate error bars,
* an Asian call with a sibling control variate — the vanilla call,
  whose mean is the closed-form Black-Scholes price — cutting the
  error bar at identical draw cost,
* pathwise Greeks (delta/vega) of the Asian payoff via autodiff
  through the compiled sampling program.

Under ``method="sobol"`` (or any QMC/antithetic method) every path node
owns one quantile dimension per driver, built through the
Brownian-bridge construction, so low-discrepancy structure reaches the
paths' dominant features; under ``method=None`` paths draw from a
column-seeded PRNG key.  Control variates and replicate error bars
operate on the OUTPUT stream and work with either mode.

Run: python examples/06_path_processes.py
"""

import numpy as np
from scipy import stats

import probabilit_tpu as pt
from probabilit_tpu import GeometricBrownianMotion
from probabilit_tpu.engine import streaming

S0, K, BARRIER = 100.0, 100.0, 130.0
MU, SIGMA, T = 0.03, 0.2, 1.0
N = 2**19  # paths per estimate; 252 steps each
BLOCK = 2**16  # 2^16 paths x 252 steps x 4 B ~ 66 MB per block


def black_scholes_call():
    d1 = (np.log(S0 / K) + (MU + SIGMA**2 / 2) * T) / (SIGMA * np.sqrt(T))
    d2 = d1 - SIGMA * np.sqrt(T)
    return float(
        S0 * stats.norm.cdf(d1) - K * np.exp(-MU * T) * stats.norm.cdf(d2)
    )


def main():
    gbm = GeometricBrownianMotion(s0=S0, mu=MU, sigma=SIGMA, T=T, steps=252)
    call = gbm.terminal() - K
    vanilla = (call > 0) * call * np.exp(-MU * T)

    # --- Barrier: up-and-out call --------------------------------------
    barrier_payoff = (gbm.maximum() < BARRIER) * vanilla
    plain = streaming.estimate(barrier_payoff, N, block_size=BLOCK, random_state=0)
    reps = streaming.estimate(
        barrier_payoff, N, block_size=BLOCK, random_state=0, replicates=8
    )
    knocked = streaming.estimate(
        (gbm.maximum() >= BARRIER) * 1.0, N, block_size=BLOCK, random_state=1
    )
    print(f"up-and-out call, S0={S0:g} K={K:g} barrier={BARRIER:g}")
    print(f"  plain MC        : {plain['mean']:.4f} +/- {plain['sem']:.4f}")
    print(f"  8 replicates    : {reps['mean']:.4f} +/- {reps['sem']:.4f}")
    print(f"  P(knock-out)    : {knocked['mean']:.4f} +/- {knocked['sem']:.4f}")

    # --- Asian call with a control variate -----------------------------
    # The vanilla call is a SIBLING node sharing the same path draws and
    # has a closed-form mean (Black-Scholes): a textbook control.
    ac = gbm.average() - K
    asian = (ac > 0) * ac * np.exp(-MU * T)
    a_plain = streaming.estimate(asian, N, block_size=BLOCK, random_state=0)
    a_cv = streaming.estimate(
        asian,
        N,
        block_size=BLOCK,
        random_state=0,
        control=(vanilla, black_scholes_call()),
    )
    print("Asian call (arithmetic average)")
    print(f"  plain MC        : {a_plain['mean']:.4f} +/- {a_plain['sem']:.4f}")
    print(
        f"  vanilla control : {a_cv['mean']:.4f} +/- {a_cv['sem']:.4f} "
        f"(rho={a_cv['control_rho']:.2f}, "
        f"{a_plain['sem'] / a_cv['sem']:.1f}x tighter)"
    )

    # --- Pathwise Greeks of the (continuous) Asian payoff --------------
    greeks = pt.sensitivity(asian, wrt=gbm, size=2**17, random_state=2)
    print(
        f"  Greeks          : delta={greeks[(gbm, 's0')]:.4f}  "
        f"vega={greeks[(gbm, 'sigma')]:.2f}"
    )


if __name__ == "__main__":
    main()
