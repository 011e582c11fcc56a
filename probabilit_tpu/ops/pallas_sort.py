"""Pallas blocked bitonic sort: hand-scheduled (key, payload) row sorts.

XLA's variadic sort on v5e runs at ~3.5 ns/element (measured, BASELINE.md)
and is the cost floor of the exact Iman-Conover transform (4 sorts over a
(50, 1e7) matrix = 6.75 s).  This module implements the comparison
network by hand to measure how much of that constant is recoverable.

VERDICT (round 3, measured on chip — full numbers in BASELINE.md): none.
The kernels are CORRECT on hardware, but a complete compare-exchange
step costs 52 ps/elem/step (VMEM-bandwidth-bound), long unrolled bodies
degrade a further ~36x under Mosaic, and even at the 13 ps single-
primitive floor a ~300-step network lands above XLA's fused sort, which
keeps tiles register-resident across network levels — a fusion Pallas
cannot express.  The module stays in-tree as the measured evidence and
a working reference for roll/mask/exchange idioms; production
Iman-Conover keeps XLA sorts.  Original measurement goal:

* ``sort_runs``   — phase 1: sort consecutive 8192-element runs of every
  row with ALTERNATING directions (run g ascending iff g even): the
  first 13 stages of a standard bitonic network, one kernel, grid over
  run tiles, all exchanges as roll/compare/select in VMEM.
* ``merge_stage`` — one bitonic stage k (steps j = k-1..0) over whole
  rows: block-level compare-exchange passes for j >= 13 (pure
  elementwise min/max between 8192-blocks, no lane crossing), then ONE
  in-VMEM tail kernel running steps j = 12..0.
* ``bitonic_sort_rows`` — the assembled sorter: pads rows to a
  power-of-two slot count with sentinel keys, runs phase 1 + stages
  14..log2(n'), returns the sorted prefix.  The whole pipeline is one
  jitted program (a few dozen pallas_call dispatches fused into one
  XLA dispatch — the axon tunnel costs ~30 ms per host dispatch).

Design notes (full roofline: BASELINE.md):

* run layout is row-major (64, 128): element e = 128*r + c, so exchange
  distances 2^j are lane rolls for j < 7 and sublane rolls for
  7 <= j <= 12 — every step is roll + compare + select, vectorised;
* direction bits come from broadcasted-iota masks (bit s of the element
  index for stage s), so one kernel body serves every stage;
* the pad region is materialised (sentinel keys) — with alternating
  directions finite data migrates through the pad region mid-network,
  so skipping pad blocks would need a host-side block-permutation
  simulation; at 1e7 -> 2^24 the materialised pad is a 1.68x slot
  overhead, acceptable for a measurement kernel.

Reference semantics target: the sorts inside Iman-Conover
(``correlation.py:288-425``); the contract here is sortedness plus exact
(key, payload) pairing, verified in tests/test_pallas_sort.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sort_runs", "merge_stage", "bitonic_sort_rows"]

_RUN = 8192  # elements per phase-1 run
_SUB = 64  # sublanes per run tile
_LANES = 128
_RUN_LOG = 13


def _bit_mask(shape, bit):
    """Bit ``bit`` of the in-run element index e = 128*r + c as a mask.

    Bits 0..6 live in the lane index, 7..12 in the sublane index (the
    row-major (64, 128) run layout).  ``shape`` is the operand shape with
    (sublane, lane) as the two minor dims.
    """
    if bit < 7:
        iota = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
        return (iota >> bit) & 1
    iota = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2)
    return (iota >> (bit - 7)) & 1


def _exchange(x, p, bit, keep_min):
    """One compare-exchange at distance 2^bit inside (..., 64, 128).

    ``keep_min``: boolean (broadcastable to x), True where this element
    keeps the pair minimum (= ascending-lo or descending-hi).  All mask
    arithmetic happens in int32 at the call sites; i1 values appear only
    as a compare feeding a select (Mosaic lowers i1-vector arithmetic
    poorly).  Ties never swap, so (key, payload) pairing stays exact for
    duplicate keys.
    """
    if bit < 7:
        axis, shift = x.ndim - 1, 1 << bit
    else:
        axis, shift = x.ndim - 2, 1 << (bit - 7)
    length = x.shape[axis]
    hi = _bit_mask(x.shape, bit) == 1
    # pltpu.roll wants non-negative shifts: roll by L - s is roll by -s.
    x_fwd = pltpu.roll(x, length - shift, axis)  # lo elements' partner
    x_bwd = pltpu.roll(x, shift, axis)  # hi elements' partner
    partner = jnp.where(hi, x_bwd, x_fwd)
    p_fwd = pltpu.roll(p, length - shift, axis)
    p_bwd = pltpu.roll(p, shift, axis)
    partner_p = jnp.where(hi, p_bwd, p_fwd)
    new_x = jnp.where(keep_min, jnp.minimum(x, partner), jnp.maximum(x, partner))
    new_p = jnp.where(new_x != x, partner_p, p)
    return new_x, new_p


# ---------------------------------------------------------------------
# Phase 1: local run sort (stages 1..13)
# ---------------------------------------------------------------------


def _local_sort_kernel(x_ref, p_ref, xo_ref, po_ref):
    x = x_ref[:]
    p = p_ref[:]
    # Direction bit per stage: ascending iff bit ``stage`` of the global
    # element index is 0; for stage 13 that is the run parity (rows hold
    # a power-of-two run count, so per-row parity equals global parity).
    # keep_min = asc XOR hi = (dir_bit == pair_bit): pure int32 math,
    # one compare per step.
    run_iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    runs_per_block = x.shape[0]
    g0 = pl.program_id(0) * runs_per_block
    parity_bits = (run_iota + g0) & 1
    for stage in range(1, _RUN_LOG + 1):
        if stage < _RUN_LOG:
            dir_bits = _bit_mask(x.shape, stage)
        else:
            dir_bits = parity_bits
        for bit in range(stage - 1, -1, -1):
            keep_min = dir_bits == _bit_mask(x.shape, bit)
            x, p = _exchange(x, p, bit, keep_min)
    xo_ref[:] = x
    po_ref[:] = p


def sort_runs(keys, payload, runs_per_block=16, interpret=False):
    """Sort each 8192-element run (alternating directions by run parity).

    keys, payload: (R, 64, 128) — R runs in row-major (r, c) layout.
    Returns (keys', payload') with run g ascending for even g,
    descending for odd g — the phase-1 output of a bitonic network.
    """
    R = keys.shape[0]
    assert keys.shape == (R, _SUB, _LANES) and payload.shape == keys.shape
    rpb = min(runs_per_block, R)
    while R % rpb:
        rpb -= 1
    spec = pl.BlockSpec((rpb, _SUB, _LANES), lambda i: (i, 0, 0))
    return pl.pallas_call(
        _local_sort_kernel,
        grid=(R // rpb,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(keys.shape, keys.dtype),
            jax.ShapeDtypeStruct(payload.shape, payload.dtype),
        ],
        interpret=interpret,
    )(keys, payload)


# ---------------------------------------------------------------------
# Phases 2+: stage k = block-level steps then the in-VMEM tail
# ---------------------------------------------------------------------


def _block_exchange_kernel(x_ref, p_ref, xo_ref, po_ref, *, stage, dist):
    """Compare-exchange between partner blocks at distance ``dist``.

    Block layout: (1, 1, 2, 1, 64, 128) — (row, group, side, inner).
    The lo block's index within the row is group*2*dist + inner; bit
    (stage - 13) of it fixes the direction for the whole pair.
    """
    lo_x = x_ref[0, 0, 0, 0]
    hi_x = x_ref[0, 0, 1, 0]
    lo_p = p_ref[0, 0, 0, 0]
    hi_p = p_ref[0, 0, 1, 0]
    lo_block = pl.program_id(1) * (2 * dist) + pl.program_id(2)
    asc = ((lo_block >> (stage - _RUN_LOG)) & 1) == 0

    x_min = jnp.minimum(lo_x, hi_x)
    x_max = jnp.maximum(lo_x, hi_x)
    # No i1-vector selects in Mosaic: combine with logical ops.
    swap_lo = (asc & (hi_x < lo_x)) | (~asc & (hi_x > lo_x))
    xo_ref[0, 0, 0, 0] = jnp.where(asc, x_min, x_max)
    xo_ref[0, 0, 1, 0] = jnp.where(asc, x_max, x_min)
    po_ref[0, 0, 0, 0] = jnp.where(swap_lo, hi_p, lo_p)
    po_ref[0, 0, 1, 0] = jnp.where(swap_lo, lo_p, hi_p)


def _tail_kernel(x_ref, p_ref, xo_ref, po_ref, *, stage):
    """Steps j = 12..0 of stage ``stage`` for one block per grid step."""
    x = x_ref[0, 0]
    p = p_ref[0, 0]
    block = pl.program_id(1)
    # keep_min = asc XOR hi = (dir_bit == pair_bit); dir_bit constant
    # per block (a bit of the block index), int32 math only.
    dir_bit = (block >> (stage - _RUN_LOG)) & 1
    for bit in range(_RUN_LOG - 1, -1, -1):
        keep_min = _bit_mask(x.shape, bit) == dir_bit
        x, p = _exchange(x, p, bit, keep_min)
    xo_ref[0, 0] = x
    po_ref[0, 0] = p


def merge_stage(keys, payload, stage, interpret=False):
    """Bitonic stage ``stage`` (steps j = stage-1..0) over every row.

    keys, payload: (K, n_blocks, 64, 128), n_blocks a power of two,
    every 2^(stage-13)-block group bitonic (the phase-1/earlier-stage
    invariant).
    """
    K, n_blocks = keys.shape[:2]
    assert n_blocks & (n_blocks - 1) == 0
    for j in range(stage - 1, _RUN_LOG - 1, -1):
        d = 1 << (j - _RUN_LOG)
        g = n_blocks // (2 * d)
        k6 = keys.reshape(K, g, 2, d, _SUB, _LANES)
        p6 = payload.reshape(K, g, 2, d, _SUB, _LANES)
        spec = pl.BlockSpec(
            (1, 1, 2, 1, _SUB, _LANES), lambda r, i, jj: (r, i, 0, jj, 0, 0)
        )
        kernel = functools.partial(
            _block_exchange_kernel, stage=stage, dist=d
        )
        k6, p6 = pl.pallas_call(
            kernel,
            grid=(K, g, d),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct(k6.shape, keys.dtype),
                jax.ShapeDtypeStruct(p6.shape, payload.dtype),
            ],
            interpret=interpret,
        )(k6, p6)
        keys = k6.reshape(K, n_blocks, _SUB, _LANES)
        payload = p6.reshape(K, n_blocks, _SUB, _LANES)

    spec = pl.BlockSpec((1, 1, _SUB, _LANES), lambda r, i: (r, i, 0, 0))
    kernel = functools.partial(_tail_kernel, stage=stage)
    return pl.pallas_call(
        kernel,
        grid=(K, n_blocks),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(keys.shape, keys.dtype),
            jax.ShapeDtypeStruct(payload.shape, payload.dtype),
        ],
        interpret=interpret,
    )(keys, payload)


# ---------------------------------------------------------------------
# Assembled row sorter
# ---------------------------------------------------------------------


def _sentinel(dtype):
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(jnp.inf, dtype)
    return jnp.asarray(jnp.iinfo(dtype).max, dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_rows(keys, payload, interpret=False):
    """Sort each row of (K, N) ``keys`` ascending, carrying ``payload``.

    Pads rows to the next power-of-two multiple of 8192 with sentinel
    (max) keys, runs phase 1 and stages 14..log2(n'), returns the first
    N columns.  One jitted program end to end.
    """
    K, N = keys.shape
    n_blocks = max(2, int(2 ** np.ceil(np.log2(max(N, _RUN) / _RUN))))
    n_pad = n_blocks * _RUN
    kp = jnp.full((K, n_pad), _sentinel(keys.dtype), keys.dtype)
    kp = kp.at[:, :N].set(keys)
    pp = jnp.zeros((K, n_pad), payload.dtype).at[:, :N].set(payload)
    kp = kp.reshape(K * n_blocks, _SUB, _LANES)
    pp = pp.reshape(K * n_blocks, _SUB, _LANES)
    kp, pp = sort_runs(kp, pp, interpret=interpret)
    kp = kp.reshape(K, n_blocks, _SUB, _LANES)
    pp = pp.reshape(K, n_blocks, _SUB, _LANES)
    for stage in range(_RUN_LOG + 1, int(np.log2(n_pad)) + 1):
        kp, pp = merge_stage(kp, pp, stage, interpret=interpret)
    return (
        kp.reshape(K, n_pad)[:, :N],
        pp.reshape(K, n_pad)[:, :N],
    )
