"""Generic SDE path node: Euler-Maruyama and Milstein schemes.

Framework extension (the reference models scalar draws only).  The
schemes have known strong orders (0.5 / 1.0), so the core tests couple
each discretisation to the EXACT GBM solution built from the same
driving increments and pin the error magnitudes and convergence rates;
the rest covers the path-node plumbing contracts (time-grid convention,
QMC slabs, streaming bitwise equality, mesh invariance, validation).
"""

import numpy as np
import pytest

from probabilit_tpu.models.sde import SDE


def _gbm_fns(mu=0.05, sigma=0.2):
    return (lambda t, x: mu * x), (lambda t, x: sigma * x)


class TestSchemeAccuracy:
    def _coupled_rms(self, scheme, steps, n=4096, mu=0.05, sigma=0.2, seed=0):
        """RMS terminal error of the scheme vs the exact GBM solution
        driven by the SAME standard-normal increments."""
        import jax.numpy as jnp

        drift, diff = _gbm_fns(mu, sigma)
        node = SDE(drift, diff, x0=100.0, T=1.0, steps=steps, scheme=scheme)
        z = np.random.default_rng(seed).standard_normal((n, steps))
        path = np.asarray(node._path_from_increments(jnp.asarray(z, jnp.float32)))
        dt = 1.0 / steps
        w = np.cumsum(np.sqrt(dt) * z, axis=1)
        t = dt * np.arange(1, steps + 1)
        exact = 100.0 * np.exp((mu - 0.5 * sigma**2) * t + sigma * w)
        return float(np.sqrt(np.mean((path[:, -1] - exact[:, -1]) ** 2)))

    def test_milstein_beats_euler_strongly(self):
        e = self._coupled_rms("euler", 64)
        m = self._coupled_rms("milstein", 64)
        assert m < 0.3 * e

    def test_strong_convergence_rates(self):
        # Strong order 0.5: quartering dt halves the error.  Order 1:
        # quartering dt quarters it.
        e16, e64 = self._coupled_rms("euler", 16), self._coupled_rms("euler", 64)
        m16, m64 = (
            self._coupled_rms("milstein", 16),
            self._coupled_rms("milstein", 64),
        )
        assert 1.4 < e16 / e64 < 3.0  # ~2 expected
        assert 3.0 < m16 / m64 < 6.0  # ~4 expected

    def test_additive_noise_milstein_equals_euler(self):
        # b' = 0 makes the Ito correction vanish identically; autodiff
        # must produce an exact zero, not a numerical one.
        import jax.numpy as jnp

        drift = lambda t, x: 1.5 * (0.5 - x)  # noqa: E731
        diff = lambda t, x: 0.3  # noqa: E731
        z = jnp.asarray(
            np.random.default_rng(1).standard_normal((256, 32)), jnp.float32
        )
        e = SDE(drift, diff, x0=2.0, steps=32)._path_from_increments(z)
        m = SDE(drift, diff, x0=2.0, steps=32, scheme="milstein")
        np.testing.assert_array_equal(
            np.asarray(e), np.asarray(m._path_from_increments(z))
        )

    def test_left_endpoint_time_grid(self):
        # Zero diffusion reduces Euler to the explicit left-endpoint
        # quadrature sum_{k<S} a(k dt) dt — exact to float32 eps.
        import jax.numpy as jnp

        steps = 16
        node = SDE(lambda t, x: jnp.cos(t), lambda t, x: 0.0, x0=0.0, steps=steps)
        z = jnp.zeros((4, steps), jnp.float32)
        out = np.asarray(node._path_from_increments(z))
        dt = 1.0 / steps
        want = np.cumsum(np.cos(dt * np.arange(steps)) * dt)
        np.testing.assert_allclose(out[0], want, atol=1e-6)

    def test_euler_ou_matches_exact_law(self):
        # Weak error at 256 steps is far below sampling noise.
        node = SDE(
            lambda t, x: 1.5 * (0.5 - x),
            lambda t, x: 0.3,
            x0=2.0,
            T=1.0,
            steps=256,
        )
        s = np.asarray(node.terminal().sample(30000, random_state=0))
        a = np.exp(-1.5)
        assert s.mean() == pytest.approx(0.5 + 1.5 * a, abs=0.01)
        assert s.var() == pytest.approx(0.3**2 * (1 - a * a) / 3.0, rel=0.05)


class TestPlumbing:
    def test_sobol_streamed_bitwise(self):
        from probabilit_tpu.engine import streaming

        drift, diff = _gbm_fns()
        node = SDE(drift, diff, x0=100.0, steps=8)
        t = node.terminal()
        full = np.asarray(t.sample(512, random_state=3, method="sobol"))
        blocks = streaming.sample_streaming(
            t, 512, block_size=128, random_state=3, method="sobol"
        )
        np.testing.assert_array_equal(full, np.asarray(blocks))

    def test_sobol_mesh_invariance(self):
        from probabilit_tpu.parallel import make_mesh, use_mesh

        drift, diff = _gbm_fns()
        node = SDE(drift, diff, x0=100.0, steps=8, scheme="milstein")
        payoff = (node.minimum() > 80) * node.average()
        base = np.asarray(payoff.sample(2048, random_state=5, method="sobol"))
        with use_mesh(make_mesh()):
            sharded = np.asarray(payoff.sample(2048, random_state=5, method="sobol"))
        np.testing.assert_array_equal(base, sharded)

    def test_plan_width_and_functionals(self):
        from probabilit_tpu.engine import compile as _compile

        drift, diff = _gbm_fns()
        node = SDE(drift, diff, x0=100.0, steps=8)
        plan = _compile.get_plan(node.terminal())
        assert plan.d == 1
        # Slab dim 0 IS the node's scalar column, so d_total equals the
        # total driver count (one per step here).
        assert plan.d_total == 8
        assert node.terminal() is node.terminal()  # memoised

    def test_distinct_callables_distinct_signatures(self):
        a = SDE(lambda t, x: 0.0, lambda t, x: 1.0, steps=4)
        b = SDE(lambda t, x: 0.0, lambda t, x: 1.0, steps=4)
        assert a._static_signature() != b._static_signature()

    def test_validation(self):
        with pytest.raises(TypeError, match="drift"):
            SDE(1.0, lambda t, x: 1.0)
        with pytest.raises(TypeError, match="diffusion"):
            SDE(lambda t, x: 0.0, 1.0)
        with pytest.raises(ValueError, match="scheme"):
            SDE(lambda t, x: 0.0, lambda t, x: 1.0, scheme="heun")
        with pytest.raises(ValueError, match="steps"):
            SDE(lambda t, x: 0.0, lambda t, x: 1.0, steps=0)
