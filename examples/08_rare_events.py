"""Rare-event estimation with quantile-space importance sampling.

Estimating P(event) ~ 1e-9 by plain Monte Carlo needs ~1e9 draws per
observed HIT — a hundred billion draws for a 1% error bar.  The
`tilted()` helper makes the event routine instead: it draws the
quantile of a chosen driver from a polynomial proposal concentrated in
the tail and returns the unbiased likelihood-ratio weight, all as
ordinary graph nodes.  No pdfs, no per-family math, and every engine
feature (streaming, QMC, replicates, meshes) composes unchanged.

The scipy-driven reference has no variance-reduction machinery; at
these probabilities it simply cannot produce an answer.

Run: python examples/08_rare_events.py   (seconds on CPU or TPU)
"""

import numpy as np
import scipy.stats

from probabilit_tpu import suggest_tilt, tilted
from probabilit_tpu.engine import streaming


def main():
    # ------------------------------------------------------------------
    # 1. A deep normal tail with a known answer: P(Z < -6) = 9.866e-10.
    # ------------------------------------------------------------------
    p_target = 1e-9  # rough guess of the rarity (sets efficiency only)
    k = suggest_tilt(p_target)
    z, w = tilted("norm", k=k, tail="lower")
    est = streaming.estimate(
        (z < -6.0) * w, 10**6, block_size=2**17, random_state=0
    )
    exact = scipy.stats.norm.cdf(-6.0)
    print(f"tilt exponent k* = {k:.3e}")
    print(
        f"P(Z < -6): estimate {est['mean']:.4e} +/- {est['sem']:.1e}"
        f"   exact {exact:.4e}   rel err "
        f"{est['mean'] / exact - 1.0:+.3%}"
    )

    # ------------------------------------------------------------------
    # 2. A structural-failure model: capacity vs load with a safety
    #    margin chosen so failure is a ~1e-7 event.  The load is the
    #    dominant driver, so IT gets the tilt; capacity stays as-is.
    # ------------------------------------------------------------------
    from probabilit_tpu import Distribution

    load, w2 = tilted("lognorm", k=suggest_tilt(1e-7), tail="upper", s=0.25)
    capacity = Distribution("norm", loc=3.2, scale=0.15)
    failure = (load > capacity) * w2
    est2 = streaming.estimate(
        failure, 10**6, block_size=2**17, random_state=1,
        replicates=4, method="sobol",
    )
    print(
        f"P(load > capacity): {est2['mean']:.3e} "
        f"+/- {est2['sem']:.1e}  (randomised-QMC error bar, 4 replicates)"
    )

    # Weight diagnostics: E[w] = 1 and the effective sample size.
    wsq = w2 * w2
    diag = streaming.estimate_many(
        [w2, wsq], 10**6, block_size=2**17, random_state=2
    )
    ew, ew2 = diag[w2]["mean"], diag[wsq]["mean"]
    print(
        f"E[w] = {ew:.4f} (should be ~1);  "
        f"effective sample size = {ew * ew / ew2:.2%} of draws"
    )


if __name__ == "__main__":
    main()
