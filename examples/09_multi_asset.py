"""Multi-asset books: joint paths, basket risk, and Bermudan max options.

Three workflows on the joint multi-asset path families (round 4):

* a 3-asset book under ``CorrelatedMerton`` — correlated diffusions plus
  a COMMON systemic crash stream — profiled with ``estimate_many``:
  per-desk and total VaR/CVaR with RQMC error bars from ONE compiled
  streamed program, and the closed-form log-terminal covariance as the
  built-in correctness check;
* the Andersen-Broadie (2004) Bermudan max-call benchmark on two
  correlated GBM assets — ``american_price`` with a per-asset payoff
  and the LS 2001 §8.4 (max, min) regression basis;
* a worst-of put on two ``CorrelatedHeston`` assets, where the
  continuation regression conditions on all four joint states
  (2 assets + 2 exact CIR variances).

Run: python examples/09_multi_asset.py
"""

import numpy as np

import jax.numpy as jnp

from probabilit_tpu import (
    CorrelatedGBM,
    CorrelatedHeston,
    CorrelatedMerton,
    american_price,
    estimate_many,
)


def desk_var_cvar():
    print("=== 1. Systemic-jump book: per-desk VaR/CVaR in one program ===")
    # Three desks; desk co-movement from BOTH a diffusive correlation
    # matrix and a shared crash stream (intensity 0.3/yr, mean -8%).
    a, b, c = CorrelatedMerton(
        s0=[100.0, 100.0, 100.0],
        mu=[0.05, 0.04, 0.03],
        sigma=[0.2, 0.25, 0.15],
        corr=[[1, 0.5, 0.2], [0.5, 1, 0.3], [0.2, 0.3, 1]],
        jump_rate=[0.5, 0.3, 0.0],
        jump_mean=-0.04,
        jump_std=0.08,
        common_rate=0.3,
        common_mean=-0.08,
        common_std=0.04,
        loadings=[1.0, 0.8, 0.5],
        T=1.0,
        steps=64,
    )
    # LOSS per desk (long one unit each) and the total book: estimating
    # on losses puts VaR99 at the 0.99 quantile and CVaR99 at the
    # matching upper-tail expected shortfall directly.
    loss = [100.0 - v.terminal() for v in (a, b, c)]
    total = sum(loss)
    res = estimate_many(
        loss + [total],
        size=2**22,
        block_size=2**19,
        quantiles=(0.99,),
        cvar=(0.99,),
        method="sobol",
        replicates=8,
        random_state=0,
    )
    names = ("desk_a", "desk_b", "desk_c", "total")
    for name, node in zip(names, loss + [total]):
        r = res[node]
        print(
            f"  {name:7s} mean loss {r['mean']:+7.3f} +/- {r['sem']:.3f}   "
            f"VaR99 {r['q0.99']:7.2f}   CVaR99 {r['cvar0.99']:7.2f}"
        )
    sub = sum(res[node]["q0.99"] for node in loss)
    print(
        f"  diversification: total VaR99 {res[total]['q0.99']:.2f}"
        f" < sum of desk VaR99s {sub:.2f}"
    )


def bermudan_max_call():
    print("=== 2. Bermudan max-call (Andersen-Broadie 2004) ===")
    # S0 = 100, K = 100, r = 5%, dividend 10%, sigma = 20%, rho = 0,
    # T = 3, 9 exercise dates.  Published value 13.902.
    s1, _s2 = CorrelatedGBM(
        [100.0, 100.0], [0.05 - 0.10] * 2, [0.2, 0.2], np.eye(2),
        T=3.0, steps=9,
    )
    res = american_price(
        s1.joint,
        lambda x, y: jnp.maximum(jnp.maximum(x, y) - 100.0, 0.0),
        rate=0.05,
        size=2**17,
        degree=5,
        method="sobol",
        random_state=0,
        state=lambda x, y: (jnp.maximum(x, y), jnp.minimum(x, y)),
    )
    print(
        f"  two-pass lower bound {res['price']:.3f} +/- {res['se']:.3f} "
        f"(published 13.902; exercised early on "
        f"{res['exercise_fraction']:.0%} of paths)"
    )


def worst_of_put_heston():
    print("=== 3. Worst-of put on two correlated Heston assets ===")
    h1, _h2 = CorrelatedHeston(
        [100.0, 100.0], [0.05, 0.05], v0=0.04, kappa=2.0, theta=0.04,
        sigma=0.3, rho=[-0.6, -0.4], corr=[[1, 0.5], [0.5, 1]],
        T=1.0, steps=16,
    )
    res = american_price(
        h1.joint,
        lambda x, y: jnp.maximum(100.0 - jnp.minimum(x, y), 0.0),
        rate=0.05,
        size=2**16,
        degree=2,  # 15 joint monomials of (S1, S2, V1, V2)
        method="sobol",
        random_state=1,
    )
    print(
        f"  Bermudan worst-of put {res['price']:.3f} +/- {res['se']:.3f} "
        f"(4-state joint regression; exercise fraction "
        f"{res['exercise_fraction']:.0%})"
    )


def main():
    desk_var_cvar()
    bermudan_max_call()
    worst_of_put_heston()


if __name__ == "__main__":
    main()
