"""End-to-end sampling tests: statistical correctness vs analytic truth.

Mirrors the reference test strategy (SURVEY §4): seeded sampling compared
against closed-form expectations, plus reference README models
(README.md:19-78).
"""

import numpy as np
import pytest

from probabilit_tpu.modeling import (
    Constant,
    CumulativeDistribution,
    DiscreteDistribution,
    Distribution,
    EmpiricalDistribution,
    Equal,
    Exp,
    scalar_transform,
)


class TestBasicSampling:
    def test_normal_moments(self):
        a = Distribution("norm", loc=5, scale=2)
        s = np.asarray(a.sample(100_000, random_state=0))
        assert np.isclose(s.mean(), 5.0, atol=0.05)
        assert np.isclose(s.std(), 2.0, atol=0.05)

    def test_uniform_range_and_mean(self):
        a = Distribution("uniform", loc=1, scale=6)
        s = np.asarray(a.sample(50_000, random_state=0))
        assert s.min() >= 1.0 and s.max() < 7.0
        assert np.isclose(s.mean(), 4.0, atol=0.05)

    def test_size_default_one(self):
        result = 2 * Distribution("expon", scale=1 / 3)
        assert np.asarray(result.sample(random_state=0)).shape == (1,)

    def test_samples_attribute_populated_everywhere(self):
        a = Distribution("norm", loc=5, scale=1)
        b = Distribution("expon", scale=1)
        expression = a**b + a * b + 5 * b
        expression.sample(5, random_state=0)
        for node in set(expression.nodes()):
            assert hasattr(node, "samples_")
        assert np.asarray(a.samples_).shape == (5,)

    def test_transform_consistency(self):
        a = Distribution("norm", loc=0, scale=1)
        expr = Exp(a) * 2 - 1
        expr.sample(1000, random_state=3)
        np.testing.assert_allclose(
            np.asarray(expr.samples_),
            np.exp(np.asarray(a.samples_)) * 2 - 1,
            rtol=1e-4,
        )

    def test_reproducible_with_same_seed(self):
        a = Distribution("norm")
        s1 = np.asarray(a.sample(100, random_state=123))
        s2 = np.asarray(a.sample(100, random_state=123))
        np.testing.assert_array_equal(s1, s2)

    def test_nonfinite_raises(self):
        a = Distribution("norm", loc=0, scale=1)
        bad = 1 / (a - a)  # 0/0 -> nan everywhere
        with pytest.raises(ValueError, match="non-finite"):
            bad.sample(10, random_state=0)


class TestReferenceReadmeModels:
    """The three README models (README.md:19-78), statistical parity."""

    def test_height_model(self):
        male = Distribution("norm", loc=176, scale=7.1)
        female = Distribution("norm", loc=162.5, scale=7.1)
        statistic = male > female
        samples = np.asarray(statistic.sample(99_999, random_state=0))
        # P(male > female) = Phi(13.5 / (7.1*sqrt(2))) ~ 0.9107
        assert np.isclose(samples.mean(), 0.9107, atol=0.01)

    def test_bird_survival_composite(self):
        eggs = Distribution("poisson", mu=3)
        survived = Distribution("binom", n=eggs, p=0.4)
        s = np.asarray(survived.sample(200_000, random_state=0))
        # Thinned Poisson: survived ~ Poisson(3 * 0.4)
        assert np.isclose(s.mean(), 1.2, atol=0.02)
        assert np.isclose(s.var(), 1.2, atol=0.03)

    def test_mutual_fund(self):
        saved_per_year = 1200
        returns = 0
        for year in range(20):
            interest = Distribution("norm", loc=1.11, scale=0.15)
            returns = returns * interest + saved_per_year
        samples = np.asarray(returns.sample(200_000, random_state=42))
        # E[returns] follows the deterministic recursion with E[interest]=1.11
        expected = 0.0
        for year in range(20):
            expected = expected * 1.11 + saved_per_year
        assert np.isclose(samples.mean(), expected, rtol=0.01)

    def test_dice_equality(self):
        dice1 = Distribution("uniform", loc=1, scale=6) // 1
        dice2 = Distribution("uniform", loc=1, scale=6) // 1
        eq = Equal(dice1, dice2)
        p = float(np.asarray(eq.sample(99_999, random_state=42)).mean())
        assert np.isclose(p, 1 / 6, atol=0.01)

    def test_pi_estimation(self):
        x = Distribution("uniform", loc=-1, scale=2)
        y = Distribution("uniform", loc=-1, scale=2)
        inside = (x**2 + y**2) <= 1
        pi_est = 4 * float(np.asarray(inside.sample(1_000_000, random_state=1)).mean())
        assert np.isclose(pi_est, np.pi, atol=0.01)


class TestCompositeDistributions:
    def test_composite_location(self):
        mu = Distribution("norm", loc=10, scale=0.001)
        x = Distribution("norm", loc=mu, scale=1)
        s = np.asarray(x.sample(100_000, random_state=0))
        assert np.isclose(s.mean(), 10.0, atol=0.05)

    def test_lognormal_composite_params(self):
        mu = Distribution("norm")
        x = Distribution("lognorm", s=1, scale=Exp(mu))
        s = np.asarray(x.sample(50_000, random_state=0))
        # log X = mu + Z, both std normal -> log-samples ~ N(0, sqrt(2))
        assert np.isclose(np.log(s).std(), np.sqrt(2), atol=0.02)


class TestNonParametricDistributions:
    def test_empirical_linear(self):
        data = [200, 200, 300, 250, 225]
        cost = EmpiricalDistribution(data)
        s = np.asarray(cost.sample(50_000, random_state=0))
        assert s.min() >= 200 and s.max() <= 300
        ref = np.quantile(data, np.linspace(0, 1, 100_001))
        assert np.isclose(s.mean(), ref.mean(), atol=1.0)

    def test_empirical_closest_observation_matches_numpy(self):
        # The non-linear methods must reproduce np.quantile exactly
        # (reference wraps np.quantile directly, modeling.py:840-841).
        data = [1, 2, 3, 4, 5, 6]
        dice = EmpiricalDistribution(data, method="closest_observation")
        q = np.linspace(0.001, 0.999, 501)
        out = np.asarray(dice.sample_from_quantiles(q.reshape(-1, 1)))
        expected = np.quantile(data, np.asarray(q, np.float32).astype(np.float64),
                               method="closest_observation")
        np.testing.assert_array_equal(out, expected)

    def test_empirical_interpolating_method_keeps_float_result(self):
        # np.quantile returns floats for interpolating methods even on
        # integer data; casting back to the data dtype would truncate
        # (midpoint of [1, 2] is 1.5, not 1).
        emp = EmpiricalDistribution([1, 2], method="midpoint")
        out = np.asarray(emp.sample_from_quantiles(np.array([[0.5]])))
        np.testing.assert_allclose(out, [1.5])

        emp2 = EmpiricalDistribution([1, 2], method="hazen")
        out2 = np.asarray(emp2.sample_from_quantiles(np.array([[0.3]])))
        np.testing.assert_allclose(
            out2, np.quantile([1, 2], 0.3, method="hazen"), rtol=1e-6
        )

    def test_cumulative_interpolation(self):
        distr = CumulativeDistribution([0, 0.2, 0.8, 1], [10, 15, 20, 25])
        qs = np.linspace(0, 1, num=6)
        out = np.asarray(distr.sample_from_quantiles(qs.reshape(-1, 1)))
        np.testing.assert_allclose(
            out, [10.0, 15.0, 16.6666667, 18.3333333, 20.0, 25.0], rtol=1e-5
        )

    def test_cumulative_validation(self):
        with pytest.raises(ValueError, match="strictly increasing"):
            CumulativeDistribution([0, 0.5, 0.4, 1], [1, 2, 3, 4])
        with pytest.raises(ValueError, match="Lowest quantile"):
            CumulativeDistribution([0.1, 0.5, 1], [1, 2, 3])

    def test_discrete_numeric(self):
        distr = DiscreteDistribution([10, 15, 20], probabilities=[0.2, 0.3, 0.5])
        s = np.asarray(distr.sample(100_000, random_state=0))
        values, counts = np.unique(s, return_counts=True)
        np.testing.assert_array_equal(values, [10, 15, 20])
        np.testing.assert_allclose(counts / len(s), [0.2, 0.3, 0.5], atol=0.01)

    def test_discrete_strings(self):
        distr = DiscreteDistribution(["A", "B", "C", "D", "E", "F"])
        s = distr.sample(9, random_state=42)
        assert s.dtype.kind == "U"
        assert set(np.unique(s)) <= {"A", "B", "C", "D", "E", "F"}

    def test_discrete_validation(self):
        with pytest.raises(ValueError, match="sum to 1"):
            DiscreteDistribution([1, 2], probabilities=[0.5, 0.4])
        with pytest.raises(ValueError, match="Length mismatch"):
            DiscreteDistribution([1, 2, 3], probabilities=[0.5, 0.5])

    def test_discrete_large_object_tables_sign_differently(self):
        # repr(array) truncates past 1000 elements; the static signature
        # must still distinguish big string tables that differ deep inside.
        v1 = [f"s{i}" for i in range(1500)]
        v2 = list(v1)
        v2[1200] = "different"
        p = np.ones(1500) / 1500
        d1 = DiscreteDistribution(v1, probabilities=p)
        d2 = DiscreteDistribution(v2, probabilities=p)
        assert d1._static_signature() != d2._static_signature()


class TestScalarTransform:
    def test_traceable_function_compiles(self):
        @scalar_transform
        def f(a, b):
            return a * b + 1

        x = Distribution("norm")
        y = Distribution("norm")
        expr = f(x, y)
        s = np.asarray(expr.sample(1000, random_state=0))
        np.testing.assert_allclose(
            s, np.asarray(x.samples_) * np.asarray(y.samples_) + 1, rtol=1e-5
        )

    def test_untraceable_function_falls_back(self):
        @scalar_transform
        def f(a, b):
            if a > 0:
                return a * b
            return 0.0

        x = Distribution("norm")
        y = Distribution("norm")
        s = np.asarray(f(x, y).sample(500, random_state=0))
        xs, ys = np.asarray(x.samples_), np.asarray(y.samples_)
        expected = np.where(xs > 0, xs * ys, 0.0)
        np.testing.assert_allclose(s, expected, rtol=1e-5)

    def test_trace_time_bug_surfaces_in_warning(self):
        # A plain TypeError at trace time may be a genuine bug in the user
        # function; the fallback warning must carry the original message so
        # the bug is visible before the opaque runtime callback failure.
        @scalar_transform
        def bad(a):
            return "a" + a

        node = bad(Distribution("norm"))
        with pytest.warns(UserWarning, match="raised at trace time"):
            with pytest.raises(Exception):
                node.sample(8, random_state=0)

    def test_non_node_args(self):
        @scalar_transform
        def f(a, factor):
            return a * factor

        x = Distribution("norm")
        s = np.asarray(f(x, 3.0).sample(100, random_state=0))
        np.testing.assert_allclose(s, np.asarray(x.samples_) * 3.0, rtol=1e-5)

    def test_constant_only_args(self):
        # No Node inputs at all (review r3): vmap rejects a zero-array
        # call; the value must be evaluated once and broadcast, like the
        # reference's per-sample loop.
        @scalar_transform
        def f(a, b):
            return a * b

        norm = Distribution("norm")
        expr = f(2.0, 3.0) + norm
        s = np.asarray(expr.sample(50, random_state=0))
        np.testing.assert_allclose(
            s, np.asarray(norm.samples_) + 6.0, rtol=1e-6
        )


class TestGCStrategy:
    def test_default_keeps_everything(self):
        a = Distribution("norm")
        inter = (a + a) ** 2 - a
        final = Exp(inter)
        final.sample(3, random_state=42)
        assert hasattr(a, "samples_")
        assert hasattr(inter, "samples_")

    def test_empty_strategy_keeps_only_sink(self):
        a = Distribution("norm")
        inter = (a + a) ** 2 - a
        final = Exp(inter)
        out = final.sample(3, random_state=42, gc_strategy=[])
        assert out is not None
        assert not hasattr(a, "samples_")
        assert not hasattr(inter, "samples_")
        assert hasattr(final, "samples_")

    def test_protected_nodes_kept(self):
        a = Distribution("norm")
        inter = (a + a) ** 2 - a
        final = Exp(inter)
        final.sample(3, random_state=42, gc_strategy=[a])
        assert hasattr(a, "samples_")
        assert not hasattr(inter, "samples_")

    def test_gc_results_identical(self):
        a = Distribution("norm")
        final = Exp((a + a) ** 2 - a)
        s1 = np.asarray(final.sample(100, random_state=7))
        s2 = np.asarray(final.sample(100, random_state=7, gc_strategy=[]))
        np.testing.assert_allclose(s1, s2, rtol=1e-6)


class TestQuantileAPI:
    def test_sample_from_quantiles(self):
        a = Distribution("uniform")
        q = np.array([[0.1], [0.5], [0.9]])
        out = np.asarray(a.sample_from_quantiles(q))
        np.testing.assert_allclose(out, [0.1, 0.5, 0.9], atol=1e-6)

    def test_quantile_count_must_match(self):
        a = Distribution("norm")
        b = Distribution("norm")
        expr = a + b
        with pytest.raises(ValueError, match="columns"):
            expr.sample_from_quantiles(np.random.rand(10, 1))

    def test_endpoint_quantiles_stay_finite(self):
        # np.linspace(0, 1) grids are a natural way to evaluate the
        # quantile function; exact 0/1 must clamp to the open interval
        # (most extreme finite draw), not hit the ppf singularity and
        # trip the non-finite guard.
        d = Distribution("norm")
        out = np.asarray(d.sample_from_quantiles(np.linspace(0, 1, 11)[:, None]))
        assert np.all(np.isfinite(out))
        assert out[0] < -5 and out[-1] > 5  # ~±5.3 sigma in float32

    def test_constant_dtype_preserved(self):
        s = np.asarray(Constant(2).sample(3, random_state=0))
        assert np.issubdtype(s.dtype, np.integer)


class TestFloat64Mode:
    def test_x64_subprocess(self):
        """PROBABILIT_TPU_X64=1 runs the whole pipeline in float64."""
        import subprocess
        import sys

        code = (
            "import os; os.environ['PROBABILIT_TPU_X64']='1';\n"
            "import jax; jax.config.update('jax_platforms','cpu')\n"
            "import numpy as np\n"
            "from probabilit_tpu.modeling import Distribution\n"
            "a, b = Distribution('norm', loc=5), Distribution('beta', a=2, b=3)\n"
            "s = np.asarray(((a * b)).sample(20000, random_state=0))\n"
            "assert s.dtype == np.float64, s.dtype\n"
            "assert abs(s.mean() - 2.0) < 0.05, s.mean()\n"
            "print('OK')\n"
        )
        result = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
        )
        assert "OK" in result.stdout, result.stderr[-2000:]
