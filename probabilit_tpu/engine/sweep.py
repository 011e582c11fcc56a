"""Batched scenario sweeps: many parameterizations, ONE compiled program.

Stress testing and what-if analysis evaluate the SAME model under a grid
of parameter scenarios (spot ladders, vol shocks, rate bumps).  The
reference re-runs its whole scipy sampling loop per scenario
(modeling.py:805-812 — every ``.sample()`` is a fresh host pass); here
the scenario axis becomes a ``jax.vmap`` batch dimension over the traced
sampling body (``engine/compile.py:build_body``) with the targeted
parameters swapped for traced scalars (the ``engine/sensitivity.py``
slot machinery), so S scenarios x N draws run as one XLA program whose
inner reductions batch onto the MXU/VPU — no per-scenario dispatch, no
per-scenario compile.

Common random numbers are the default: every scenario consumes the SAME
quantile matrix, so scenario-to-scenario differences are smooth in the
parameters (the standard CRN argument — differences of estimates have
variance O(delta^2), not O(1)), ladders are monotone where the model is,
and the draws are generated once.  ``common_random_numbers=False`` gives
each scenario an independently keyed stream instead (fresh Owen
scrambles under QMC), at (S, size, d) quantile memory.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from probabilit_tpu import config
from probabilit_tpu.engine import compile as _compile
from probabilit_tpu.engine.sampler import resolve_key
from probabilit_tpu.engine.sensitivity import (
    _QMC_METHODS,
    _normalize_wrt,
    _resolve_statistic,
    _restore_slots,
    _save_slots,
    _write_slot,
)
from probabilit_tpu.ops import qmc as _qmc
from probabilit_tpu.ops.qmc import clamp_open_unit

__all__ = ["sweep", "SweepResult"]

_SWEEP_CACHE = {}
_CACHE_LIMIT = 64


class SweepResult:
    """Per-scenario statistics, keyed by statistic name.

    ``result["mean"]`` is the ``(S,)`` array of scenario means in input
    order; ``result.scenarios`` maps each ``(node, slot)`` pair to its
    ``(S,)`` value vector; ``result.n`` is the scenario count.  When
    ``"mean"`` is among the requested statistics, ``result["sem"]`` holds
    each scenario's iid standard error (under CRN, scenario DIFFERENCES
    are far more accurate than these marginal bars suggest).
    """

    def __init__(self, stats, scenarios, size):
        self.stats = stats
        self.scenarios = scenarios
        self.n = len(next(iter(scenarios.values())))
        self.size = size

    def __getitem__(self, key):
        return self.stats[key]

    def keys(self):
        return self.stats.keys()

    def __repr__(self):
        names = ", ".join(self.stats)
        return (
            f"SweepResult({self.n} scenarios x {self.size} draws; "
            f"statistics: {names})"
        )


def _normalize_scenarios(plan, scenarios):
    """-> (pairs in canonical order, (S, P) float64 value matrix)."""
    if not isinstance(scenarios, dict) or not scenarios:
        raise ValueError(
            "scenarios must be a non-empty dict: {(node, slot): values} "
            "or {node: {slot: values}}."
        )
    flat = {}
    for k, v in scenarios.items():
        if isinstance(k, tuple) and len(k) == 2:
            flat[k] = v
        elif isinstance(v, dict):
            for slot, vals in v.items():
                flat[(k, slot)] = vals
        else:
            raise ValueError(
                "scenario keys must be (node, slot) tuples, or node keys "
                "with {slot: values} dict values; got "
                f"{type(k).__name__}: {type(v).__name__}."
            )
    wrt = {}
    for node, slot in flat:
        wrt.setdefault(node, []).append(slot)
    pairs = _normalize_wrt(plan, wrt)  # validates nodes/slots, canonical order
    cols, lengths = [], set()
    for pair in pairs:
        vals = np.atleast_1d(np.asarray(flat[pair], np.float64))
        if vals.ndim != 1:
            raise ValueError(
                f"scenario values for {pair} must be scalar or 1-D, got "
                f"shape {vals.shape}."
            )
        if not np.all(np.isfinite(vals)):
            raise ValueError(f"scenario values for {pair} contain non-finite entries.")
        cols.append(vals)
        if vals.size > 1:
            lengths.add(vals.size)
    if len(lengths) > 1:
        raise ValueError(
            f"scenario value vectors disagree on length: {sorted(lengths)}. "
            "Broadcast your grid first (np.meshgrid(...) then .ravel())."
        )
    s = lengths.pop() if lengths else 1
    theta = np.stack([np.broadcast_to(c, (s,)) for c in cols], axis=1)
    return pairs, theta


def sweep(
    sink,
    scenarios,
    size=65536,
    random_state=None,
    statistics="mean",
    correlator="imanconover",
    method=None,
    common_random_numbers=True,
):
    """Evaluate statistics of ``sink`` under S parameter scenarios at once.

    Parameters
    ----------
    sink : Node
        The quantity of interest.
    scenarios : dict
        ``{(node, slot): values}`` or ``{node: {slot: values}}`` — each
        ``values`` a length-S vector (scalars broadcast).  Slots are the
        same numeric parameter slots ``sensitivity()`` accepts, including
        indexed multi-asset slots (``"s0[1]"``).  For a full grid over
        several slots, ravel a meshgrid:
        ``np.meshgrid(spots, vols)`` then pass the ``.ravel()``ed arrays.
    size : int
        Draws per scenario.
    random_state : None | int | Generator | jax key
        Same contract as ``sample()``.
    statistics : str | callable | sequence of those
        Any mix of ``"mean"``/``"var"``/``"std"``/``"q<level>"``/
        ``"cvar<level>"`` (expected shortfall above the level) or
        jax-traceable callables of the ``(size,)`` sample vector.  When
        ``"mean"`` is requested, a per-scenario ``"sem"`` rides along.
    correlator : str | Correlator class
        As in ``sample()`` for graphs with declared correlations.
    method : None | "sobol" | "halton" | "lhs" | "antithetic"
        Quantile generator (QMC requires a correlation-free graph, as in
        ``sensitivity()``).
    common_random_numbers : bool
        True (default): all scenarios share ONE quantile matrix — the
        variance-optimal choice for scenario differences/ladders, and
        O(size * d) memory.  False: independent streams per scenario
        (fresh keys; fresh randomizations under QMC) at (S, size, d)
        memory — use for strictly independent per-scenario error bars.

    Returns
    -------
    SweepResult
        ``result[stat_name]`` -> ``(S,)`` numpy array, scenario order
        preserved.

    >>> import numpy as np, probabilit_tpu as pt
    >>> x = pt.Distribution("norm", loc=0.0, scale=1.0)
    >>> y = 2.0 * x + 1.0
    >>> res = pt.sweep(y, {(x, "loc"): np.array([-1.0, 0.0, 1.0])},
    ...                size=4096, random_state=0)
    >>> bool(np.all(np.diff(res["mean"]) > 0))
    True
    """
    plan = _compile.get_plan(sink)
    if plan.finalizers.get(sink._id) is not None:
        raise ValueError(
            "The swept node produces host-finalized (non-numeric) output; "
            "sweeps need a numeric sink."
        )
    pairs, theta_np = _normalize_scenarios(plan, scenarios)
    size = int(size)
    if size <= max(1, len(plan.corr_vars)):
        raise ValueError(f"size={size} is too small to estimate a statistic.")

    if isinstance(statistics, str) or callable(statistics):
        statistics = (statistics,)
    stat_fns, stat_keys = [], []
    for s in statistics:
        fn, k = _resolve_statistic(s)
        stat_fns.append(fn)
        stat_keys.append(k)
    names = [k if isinstance(k, str) else f"stat{i}" for i, k in enumerate(stat_keys)]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate statistics requested: {names}.")
    with_sem = "mean" in names

    method_name = None if method is None else str(method).lower().strip()
    if method_name is not None:
        if method_name not in _QMC_METHODS:
            raise ValueError(
                f"method must be one of {_QMC_METHODS} or None, got "
                f"{method!r}."
            )
        from probabilit_tpu.engine.streaming import _find_key_seeded

        seeded = _find_key_seeded(plan)
        if seeded is not None:
            raise ValueError(
                f"method={method!r} drives the run from an explicit "
                f"quantile matrix, but {seeded!r} draws from a "
                "column-seeded PRNG key; use method=None for this graph."
            )
        if plan.corr_matrix is not None:
            raise ValueError(
                "QMC sweeps require a correlation-free graph; use "
                "method=None."
            )

    correlator_cls = _compile.resolve_correlator(correlator)
    dtype = config.float_dtype()
    slot_key = tuple((node._id, slot) for node, slot in pairs)
    n_scen = theta_np.shape[0]
    crn = bool(common_random_numbers)
    cache_key = (
        plan.signature(),
        slot_key,
        tuple(stat_keys),
        with_sem,
        size,
        n_scen,
        method_name,
        crn,
        _compile.correlator_token(correlator_cls),
        jnp.dtype(dtype).name,
        _compile._active_mesh_key(),
    )
    run = _SWEEP_CACHE.get(cache_key)
    if run is None:
        run = _build_sweep_fn(
            plan, pairs, stat_fns, with_sem, size, correlator_cls,
            method_name, crn,
        )
        if len(_SWEEP_CACHE) >= _CACHE_LIMIT:
            _SWEEP_CACHE.pop(next(iter(_SWEEP_CACHE)))
        _SWEEP_CACHE[cache_key] = run

    key = resolve_key(random_state)
    theta = jnp.asarray(theta_np, dtype)
    out = jax.device_get(run(theta, key))
    stats = {}
    for name, col in zip(names + (["sem"] if with_sem else []), out):
        stats[name] = np.asarray(col, np.float64)
    bad = {k: v for k, v in stats.items() if not np.all(np.isfinite(v))}
    if bad:
        raise FloatingPointError(
            "Non-finite sweep statistics for "
            f"{sorted(bad)}; a scenario pushed a parameter outside its "
            "family's valid domain (e.g. a non-positive scale)."
        )
    return SweepResult(
        stats,
        {pair: theta_np[:, j].copy() for j, pair in enumerate(pairs)},
        size,
    )


def _build_sweep_fn(
    plan, pairs, stat_fns, with_sem, size, correlator_cls, method_name, crn
):
    """Jitted ``(theta (S,P), key) -> tuple of (S,) statistic arrays``."""
    from probabilit_tpu.parallel import mesh as _par_mesh

    sink_id = plan.sink._id
    generated_ok = (
        plan.corr_matrix is not None
        and hasattr(correlator_cls, "_recolor_scores")
        and all(_compile._generatable(v) for v in plan.corr_vars)
    )
    body = _compile.build_body(
        plan,
        correlator_cls,
        keep_ids=frozenset([sink_id]),
        check_finite=False,
        generated_ok=generated_ok,
    )
    sharding = _par_mesh.sample_sharding(ndim=2) if crn else None
    d = plan.d
    d_total = plan.d_total
    lhs_total = size if method_name == "lhs" else None

    def make_quantiles(rng_key):
        if method_name is None:
            gen_key = jax.random.fold_in(rng_key, 0x0D0E5)
            q = clamp_open_unit(
                jax.random.uniform(rng_key, (size, d), dtype=config.float_dtype())
            )
            return q, gen_key
        return (
            _qmc.generate(
                method_name, rng_key, size, d_total,
                config.float_dtype(), total=lhs_total,
            ),
            None,
        )

    def stats_of(theta, quantiles, gen_key):
        # Traced parameter swap exactly as sensitivity()'s value_of: the
        # Python-level mutation runs once per TRACE, restored on exit.
        saved = _save_slots(pairs)
        try:
            for (node, slot), th in zip(pairs, theta):
                _write_slot(node, slot, th)
            outputs, _ = body(quantiles, gen_key=gen_key)
            samples = outputs[sink_id]
            if not jnp.issubdtype(samples.dtype, jnp.inexact):
                raise ValueError(
                    "The swept node is integer-valued; cast it "
                    "(node * 1.0) to sweep real-valued statistics."
                )
            vals = tuple(f(samples) for f in stat_fns)
            if with_sem:
                vals = vals + (
                    jnp.std(samples, ddof=1) / jnp.sqrt(jnp.float32(size)),
                )
            return vals
        finally:
            _restore_slots(saved)

    if crn:

        @jax.jit
        def run(theta, key):
            quantiles, gen_key = make_quantiles(key)
            if sharding is not None:
                quantiles = jax.lax.with_sharding_constraint(quantiles, sharding)
            return jax.vmap(stats_of, in_axes=(0, None, None))(
                theta, quantiles, gen_key
            )

    else:

        @jax.jit
        def run(theta, key):
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(theta.shape[0], dtype=jnp.uint32)
            )

            def one(th, k):
                quantiles, gen_key = make_quantiles(k)
                return stats_of(th, quantiles, gen_key)

            return jax.vmap(one)(theta, keys)

    return run
