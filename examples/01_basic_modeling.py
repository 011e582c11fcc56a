"""Basic Monte Carlo modeling: graphs, composites, correlations, QMC.

Run: python examples/01_basic_modeling.py
"""

import numpy as np

from probabilit_tpu.modeling import Distribution, Exp
from probabilit_tpu.distributions import Lognormal, Triangular


def main():
    # 1. Simple model: probability one normal exceeds another.
    male = Distribution("norm", loc=176, scale=7.1)
    female = Distribution("norm", loc=162.5, scale=7.1)
    p = np.asarray((male > female).sample(99_999, random_state=0)).mean()
    print(f"P(male taller than female) = {p:.3f}")

    # 2. Composite distribution: a parameter that is itself a distribution.
    eggs = Distribution("poisson", mu=3)
    survived = Distribution("binom", n=eggs, p=0.4)
    s = np.asarray(survived.sample(1_000_000, random_state=0))
    print(f"Birds surviving per nest: mean={s.mean():.3f} (theory 1.2)")

    # 3. Friendly factories and transforms.
    cost = Triangular(low=100, mode=150, high=300)
    growth = Lognormal(mean=1.05, std=0.1)
    total = cost * growth + Exp(Distribution("norm", scale=0.1))
    s = np.asarray(total.sample(100_000, random_state=1))
    print(f"Total cost: mean={s.mean():.1f}, p95={np.quantile(s, 0.95):.1f}")

    # 4. Correlations (Iman-Conover preserves marginals exactly).
    oil_price = Distribution("lognorm", s=0.3, scale=80)
    gas_price = Distribution("lognorm", s=0.4, scale=30)
    corr = np.array([[1.0, 0.7], [0.7, 1.0]])
    revenue = (oil_price * 10 + gas_price * 5).correlate(
        oil_price, gas_price, corr_mat=corr
    )
    revenue.sample(100_000, random_state=2)
    achieved = np.corrcoef(
        np.asarray(oil_price.samples_), np.asarray(gas_price.samples_)
    )[0, 1]
    print(f"Induced oil-gas correlation: {achieved:.3f} (target 0.7)")

    # 5. Quasi-Monte Carlo: lower integration error than pseudo-random.
    x = Distribution("uniform")
    for method in [None, "sobol"]:
        est = np.asarray((x**2).sample(4096, random_state=3, method=method)).mean()
        label = method or "pseudo"
        print(f"E[U^2] via {label:>6}: {est:.5f} (exact 1/3 = 0.33333)")


if __name__ == "__main__":
    main()
