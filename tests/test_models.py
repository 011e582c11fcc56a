"""Model-level statistical tests mirroring the reference problem suite
(tests/test_modeling.py:18-210): classic probability problems with analytic
answers, conditional mixing via bernoulli arithmetic, CLT checks.
"""

import numpy as np
import pytest

from probabilit_tpu.distributions import Triangular
from probabilit_tpu.modeling import (
    All,
    Distribution,
    Equal,
    Floor,
    Max,
    Min,
)


class TestClassicProblems:
    def test_die_problem(self):
        die1 = Floor(1 + Distribution("uniform") * 6)
        die2 = Floor(1 + Distribution("uniform") * 6)
        equal = Equal(die1, die2)
        samples = np.asarray(equal.sample(99_999, random_state=42))
        np.testing.assert_allclose(samples.mean(), 1 / 6, atol=0.005)

    def test_broken_stick_problem(self):
        # P(three segments of a randomly broken stick form a triangle) = 1/4
        cut1 = Distribution("uniform", loc=0, scale=1)
        cut2 = Distribution("uniform", loc=0, scale=1)
        length1 = Min(cut1, cut2)
        length2 = Max(cut1, cut2) - Min(cut1, cut2)
        length3 = 1 - Max(cut1, cut2)
        prob = All(length1 < 1 / 2, length2 < 1 / 2, length3 < 1 / 2)
        samples = np.asarray(prob.sample(99_999, random_state=42))
        np.testing.assert_allclose(samples.mean(), 1 / 4, atol=0.01)

    def test_total_person_hours_clt(self):
        # Sum of 562 triangulars: CLT gives N(4.5*562, 0.368*sqrt(562)).
        num_rivets = 562
        total = 0
        for _ in range(num_rivets):
            total += Triangular(low=3.75, mode=4.25, high=5.5, low_perc=0, high_perc=1.0)
        samples = np.asarray(total.sample(2000, random_state=42))
        np.testing.assert_allclose(samples.mean(), 4.5 * num_rivets, rtol=0.02)
        np.testing.assert_allclose(
            samples.std(ddof=1), 0.368 * np.sqrt(num_rivets), rtol=0.05
        )

    def test_conditional_twins(self):
        # 10% identical twins: mix heights via bernoulli arithmetic.
        height1 = Distribution("norm", loc=176, scale=7.1)
        height2 = Distribution("norm", loc=176, scale=7.1)
        is_twin = Distribution("bernoulli", p=0.1)
        height2_mixed = is_twin * height1 + (1 - is_twin) * height2
        diff = abs(height2_mixed - height1)
        samples = np.asarray(diff.sample(999, random_state=42))
        h1 = np.asarray(height1.samples_)
        twins = np.asarray(is_twin.samples_).astype(bool)
        # Twins have exactly zero difference; others almost surely not.
        assert twins.sum() > 0
        assert np.allclose(samples[twins], 0.0, atol=1e-4)
        assert np.isclose(twins.mean(), 0.1, atol=0.03)
        assert (samples[~twins] > 1e-4).mean() > 0.99
        assert h1.shape == samples.shape

    def test_fault_controlled_owc(self):
        # Oil-water contact: segment 2 equals segment 1 iff the fault leaks.
        owc1 = Distribution("uniform", loc=1995, scale=10)
        fault_is_open = Distribution("bernoulli", p=0.3)
        owc2 = fault_is_open * owc1 + (1 - fault_is_open) * Distribution(
            "uniform", loc=1950, scale=50
        )
        owc2_samples = np.asarray(owc2.sample(500, random_state=42))
        owc1_samples = np.asarray(owc1.samples_)
        fault = np.asarray(fault_is_open.samples_).astype(bool)

        assert fault.sum() > 0 and (~fault).sum() > 0
        np.testing.assert_allclose(
            owc2_samples[fault], owc1_samples[fault], rtol=1e-5
        )
        closed = owc2_samples[~fault]
        assert np.all((closed >= 1950) & (closed <= 2000))

    def test_correlated_portfolio_model(self):
        from probabilit_tpu.models.benchmarks import portfolio_model

        model = portfolio_model(d=5, target_corr=0.4)
        samples = np.asarray(model.sample(20_000, random_state=0))
        assert np.isfinite(samples).all()
        # Positively correlated lognormals: heavier total variance than
        # the independent case.
        assets = sorted(
            (n for n in set(model.nodes()) if getattr(n, "distr", None) == "lognorm"),
            key=lambda n: n._id,
        )
        X = np.column_stack([np.asarray(a.samples_) for a in assets])
        corr = np.corrcoef(X, rowvar=False)
        off_diag = corr[np.triu_indices(5, 1)]
        assert np.all(off_diag > 0.2)


def _all_package_modules():
    """Every importable module in the package (reference CI runs
    ``pytest . --doctest-modules``, python.yml:41-44 — this is the
    equivalent sweep, discovered instead of hand-listed)."""
    import importlib.util
    import pkgutil

    import probabilit_tpu

    names = ["probabilit_tpu"]
    for info in pkgutil.walk_packages(
        probabilit_tpu.__path__, prefix="probabilit_tpu."
    ):
        spec = importlib.util.find_spec(info.name)
        origin = getattr(spec, "origin", "") or ""
        if origin.endswith(".so"):
            continue  # ctypes-loaded native payload, not a Python module
        names.append(info.name)
    return sorted(names)


class TestDoctestTier:
    """Executable docstring examples (the reference's primary spec tier)."""

    @pytest.mark.parametrize("module_name", _all_package_modules())
    def test_module_doctests(self, module_name):
        import doctest
        import importlib

        module = importlib.import_module(module_name)
        results = doctest.testmod(
            module,
            optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE,
        )
        assert results.failed == 0, f"{results.failed} doctest failures in {module_name}"

    def test_readme_doctests(self):
        # Reference CI: ``python -m doctest README.md`` (python.yml:45-47).
        import doctest
        import pathlib

        readme = pathlib.Path(__file__).resolve().parents[1] / "README.md"
        results = doctest.testfile(
            str(readme),
            module_relative=False,
            optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE,
        )
        assert results.failed == 0, f"{results.failed} README doctest failures"
