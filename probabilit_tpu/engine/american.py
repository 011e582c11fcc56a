"""Least-squares Monte Carlo for American/Bermudan exercise (LSMC).

Framework extension (no counterpart in the reference).  Prices optimal-
stopping payoffs on any path node (models/processes.py, levy.py,
stochvol.py, sde.py) with the Longstaff-Schwartz algorithm
(Longstaff & Schwartz 2001, "Valuing American options by simulation"):
backward induction where each exercise date's continuation value is a
polynomial regression of the discounted future cashflow on the current
state, fitted over in-the-money paths.

TPU shape: the whole backward induction is ONE ``lax.scan`` over
reversed time whose body is a ``(B, n) @ (n, B)`` Gram matmul, a
``B x B`` ridge solve (B = degree + 1, so the solve is trivially small
while the matmuls ride the MXU), and elementwise exercise selects on
the ``(n,)`` value carry — no per-date Python, no host round trips.
The regression state is STANDARDISED per date over the ITM paths
(fit-time mean/std travel with the weights), which keeps the monomial
Gram well-conditioned in float32 — measured necessary on TPU, where raw
``s/s0`` monomials left the LU solve backend-divergent and biased the
two-pass bound low; all statistics-bearing matmuls are pinned to
float32 precision (TPU's default rounds matmul inputs to bfloat16).

Estimation is two-pass by default: pass 1 fits the per-date regression
weights, pass 2 applies the fitted exercise POLICY to an independent
path sample (one forward scan) — removing the foresight (look-ahead)
bias of in-sample LSMC, so the reported price is a genuine lower-bound
estimator with a valid standard error.

For multi-factor nodes (Heston) the regression state is the asset path
alone — the classical LSM approximation; richer bases over the joint
Markov state are a documented extension point.

>>> from probabilit_tpu import GeometricBrownianMotion
>>> import jax.numpy as jnp
>>> gbm = GeometricBrownianMotion(s0=36.0, mu=0.06, sigma=0.2, T=1.0, steps=50)
>>> res = american_price(gbm, lambda s: jnp.maximum(40.0 - s, 0.0),
...                      rate=0.06, size=2**16, random_state=0)
>>> bool(abs(res["price"] - 4.478) < 0.08)   # FD benchmark (LS 2001, tab. 1)
True
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from probabilit_tpu import config

__all__ = ["american_price"]

# Jitted (fit, evaluate) pairs cached across calls: a fresh closure per
# call would retrace the 2x steps-long scan each time (seconds of
# XLA compile per price).  Keyed on everything trace-relevant; payoff
# enters by identity like every user callable in this package.
_FN_CACHE = {}


def _basis(x, degree):
    """Monomial features ``(n, degree + 1)`` of the scaled state."""
    return jnp.stack([x**p for p in range(degree + 1)], axis=1)


def _sample_paths(node, key, n, dtype, method=None):
    """(n, steps) state paths drawn from the node's own driver law.

    ``method="sobol"/...`` drives the node through its quantile-slab
    constructor (Brownian-bridge ordering for Gaussian drivers, exactly
    as engine QMC sampling does), with the scramble keyed by ``key`` —
    the fit and evaluation passes therefore get independent
    randomisations of the same low-discrepancy sequence.

    Under an active mesh the sample axis is pinned per chip (key-based
    draws have no data dependence that would otherwise stop the SPMD
    partitioner from replicating the matrix); the per-date Gram matmuls
    then reduce with XLA-inserted psums and the backward induction runs
    fully sharded.
    """
    from probabilit_tpu.parallel import mesh as _mesh

    if method is None:
        inc = node._increments(key, n, dtype)
    else:
        from probabilit_tpu.ops import qmc as _qmc

        q = _qmc.generate(method, key, n, node._q_width, dtype=dtype)
        inc = node._increments_from_slab(q, dtype)
    paths = node._path_from_increments(inc)
    sharding = _mesh.sample_sharding(ndim=paths.ndim)
    if sharding is not None:
        paths = jax.lax.with_sharding_constraint(paths, sharding)
    return paths


def _standardize(s_k, itm, dtype):
    """Per-date ITM mean/std of the state (guarded against empty ITM).

    Standardising the regression state per exercise date is what keeps
    the monomial Gram matrix well-conditioned in float32: raw monomials
    of s/s0 produced backend-dependent LU solutions (measured: the SAME
    paths gave materially different weights on TPU vs CPU and a
    systematically lower two-pass bound on TPU); powers of a zero-mean
    unit-variance state bring the condition number down to O(10).
    """
    cnt = jnp.maximum(itm.sum(), 1.0)
    mu = (s_k * itm).sum() / cnt
    var = (itm * (s_k - mu) ** 2).sum() / cnt
    sd = jnp.sqrt(var + jnp.asarray(1e-12, dtype))
    return mu, jnp.maximum(sd, jnp.asarray(1e-6, dtype))


def _fit_weights(paths, payoff, degree, disc, ridge):
    """Backward induction -> per-date ``(weights, mean, std)``.

    The carry is the value vector "cashflow discounted to the CURRENT
    date"; each scan step regresses it (ITM-weighted) on the basis of
    the per-date STANDARDISED state, then replaces it where immediate
    exercise beats the fitted continuation.  Scanned over reversed
    interior dates; the terminal date exercises intrinsically and seeds
    the carry.  The fit-time (mean, std) travel with the weights — the
    policy's features are defined relative to them.
    """
    dtype = paths.dtype
    v = payoff(paths[:, -1])
    eye = jnp.eye(degree + 1, dtype=dtype)

    def step(v, s_k):
        v = disc * v
        ex = payoff(s_k)
        itm = (ex > 0).astype(dtype)
        mu, sd = _standardize(s_k, itm, dtype)
        phi = _basis((s_k - mu) / sd, degree)
        phiw = phi * itm[:, None]
        with jax.default_matmul_precision("float32"):
            g = phiw.T @ phi
            g = g + (ridge * jnp.trace(g) / (degree + 1)) * eye
            b = phiw.T @ (v * itm)
            w = jnp.linalg.solve(g, b)
            cont = phi @ w
        v = jnp.where((itm > 0) & (ex > cont), ex, v)
        return v, (w, mu, sd)

    # Interior dates steps-2 .. 0 (reverse time order).
    _, (ws, mus, sds) = jax.lax.scan(step, v, paths[:, :-1].T[::-1])
    return ws[::-1], mus[::-1], sds[::-1]  # forward date order


def _apply_policy(paths, payoff, degree, disc, fit):
    """Forward pass: exercise the FITTED policy on independent paths."""
    ws, mus, sds = fit
    n, steps = paths.shape

    def step(carry, inp):
        stopped, value, df = carry
        s_k, w, mu, sd = inp
        ex = payoff(s_k)
        phi = _basis((s_k - mu) / sd, degree)
        with jax.default_matmul_precision("float32"):
            cont = phi @ w
        take = (~stopped) & (ex > 0) & (ex > cont)
        value = jnp.where(take, df * ex, value)
        return (stopped | take, value, df * disc), None

    init = (
        jnp.zeros((n,), bool),
        jnp.zeros((n,), paths.dtype),
        jnp.asarray(disc, paths.dtype),
    )
    (stopped, value, df), _ = jax.lax.scan(
        step, init, (paths[:, :-1].T, ws, mus, sds)
    )
    # Unexercised paths cash the terminal intrinsic value.
    value = jnp.where(stopped, value, df * payoff(paths[:, -1]))
    return value, stopped


def american_price(
    node,
    payoff,
    *,
    rate=0.0,
    size=1 << 17,
    degree=3,
    random_state=0,
    two_pass=True,
    ridge=1e-6,
    method=None,
):
    """Longstaff-Schwartz price of ``payoff`` exercisable on the grid.

    ``node`` is any path node (its ``steps`` grid dates are the
    exercise dates; add dates by raising ``steps``); ``payoff`` maps a
    grid slice of the state to intrinsic value with jnp ops (e.g.
    ``lambda s: jnp.maximum(K - s, 0.0)``).  ``rate`` is the
    continuously-compounded discount rate — price a RISK-NEUTRAL model
    by constructing the node with drift ``rate`` and discounting with
    the same ``rate``.

    ``two_pass=True`` (default) fits weights on one sample and applies
    the fitted policy to an independent second sample (foresight-free
    lower bound with a valid ``se``); ``two_pass=False`` reports the
    in-sample backward-induction estimate (slight upward foresight
    bias, half the cost).

    ``method="sobol"`` (or halton/lhs/antithetic) drives the paths with
    a low-discrepancy sequence through the node's Brownian-bridge slab
    constructor — fit and evaluation passes use independently keyed
    scrambles.  The reported ``se`` stays the iid formula, a
    conservative overestimate under QMC.

    Compiled programs are cached across calls, keyed on the node's
    static signature and the PAYOFF'S IDENTITY — pass the same function
    object when repricing (a fresh inline lambda per call recompiles
    the scan each time).

    Returns a dict: ``price`` (including immediate exercise at t=0),
    ``se``, ``exercise_fraction`` (paths stopped before T), and
    ``weights`` (per-date regression coefficients, forward order).
    """
    if method is not None and str(method).lower().strip() not in (
        "sobol",
        "halton",
        "lhs",
        "antithetic",
    ):
        raise ValueError(
            "method must be None, 'sobol', 'halton', 'lhs' or "
            f"'antithetic', got {method!r}."
        )
    if degree < 1:
        raise ValueError(f"degree must be >= 1, got {degree}.")
    if size < 2 * (degree + 1):
        raise ValueError(f"size={size} is too small for degree {degree}.")
    steps = node.steps
    if steps < 2:
        raise ValueError("American exercise needs a grid with steps >= 2.")
    dtype = config.float_dtype()
    dt = node.T / steps
    disc = math.exp(-float(rate) * dt)
    key = jax.random.PRNGKey(int(random_state))
    k_fit, k_eval = jax.random.split(key)

    x0 = None
    for attr in ("s0", "x0", "v0"):
        x0 = getattr(node, attr, None)
        if x0 is not None:
            break

    from probabilit_tpu.engine import compile as _compile

    cache_key = (
        node._static_signature(),
        id(payoff),
        size,
        degree,
        float(rate),
        float(ridge),
        None if method is None else str(method).lower().strip(),
        jnp.dtype(dtype).name,
        _compile._active_mesh_key(),
    )
    fns = _FN_CACHE.get(cache_key)
    if fns is None:

        @jax.jit
        def fit(k):
            paths = _sample_paths(node, k, size, dtype, method)
            fitted = _fit_weights(paths, payoff, degree, disc, ridge)
            # In-sample estimate: the fitted policy on the SAME paths
            # (equals classic LSM, foresight bias included).
            value, stopped = _apply_policy(paths, payoff, degree, disc, fitted)
            return fitted, value, stopped

        @jax.jit
        def evaluate(k, fitted):
            paths = _sample_paths(node, k, size, dtype, method)
            return _apply_policy(paths, payoff, degree, disc, fitted)

        if len(_FN_CACHE) > 32:
            _FN_CACHE.pop(next(iter(_FN_CACHE)))
        fns = _FN_CACHE[cache_key] = (fit, evaluate)

    fit, evaluate = fns
    fitted, value, stopped = fit(k_fit)
    if two_pass:
        value, stopped = evaluate(k_eval, fitted)

    value = np.asarray(value)
    intrinsic0 = float(
        np.asarray(payoff(jnp.full((1,), x0 if x0 is not None else 0.0, dtype)))[0]
    )
    return {
        "price": max(float(value.mean()), intrinsic0),
        "se": float(value.std(ddof=1) / math.sqrt(value.shape[0])),
        "exercise_fraction": float(np.asarray(stopped).mean()),
        "weights": np.asarray(fitted[0]),
    }
