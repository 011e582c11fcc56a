"""Block-streamed sampling for sample counts beyond HBM capacity.

The reference's only memory-scaling mechanism is deleting intermediate
``samples_`` arrays (``garbage_collector.py``); the sample axis itself must
fit in host memory.  The TPU-native equivalent of blockwise processing
(SURVEY §5, "long-context" analogue): split the sample axis into blocks,
run the compiled sampling program once per block (one compile, counter-based
per-block keys), and either

* stream kept-node outputs to host (``sample_streaming``) — full sample
  vectors of any size, device memory bounded by one block; or
* fold each block into a running reduction (``estimate``) — Monte Carlo
  estimates at 1e10+ draws with O(1) memory and no host transfer of
  samples at all.

Constraints: correlation induction needs global ranks across all samples,
so streaming requires a correlation-free graph (same spirit as the
reference's QMC/multivariate restrictions, modeling.py:144-148).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from probabilit_tpu.engine import compile as _compile
from probabilit_tpu.engine.sampler import resolve_key

__all__ = ["sample_streaming", "estimate"]


def _block_program(sink, block_size, keep_ids=None):
    plan = _compile.Plan(sink)
    if plan.corr_matrix is not None:
        raise ValueError(
            "Streamed sampling requires a correlation-free graph: "
            "correlation induction needs global ranks across all samples."
        )
    keep = frozenset({sink._id}) if keep_ids is None else keep_ids
    program = _compile.get_program(
        plan, "imanconover", keep, check_finite=False, rng_inline_n=block_size
    )
    return plan, program


def sample_streaming(sink, size, block_size=16_777_216, random_state=None):
    """Sample ``size`` draws of ``sink`` in device-sized blocks.

    Returns a host ndarray of length ``size``; device memory is bounded by
    one block regardless of ``size``.
    """
    plan, program = _block_program(sink, block_size)
    key = resolve_key(random_state)

    n_blocks = -(-size // block_size)
    out = None
    for b in range(n_blocks):
        block_key = jax.random.fold_in(key, b)
        outputs, _ = program(block_key)
        block = np.asarray(outputs[sink._id])
        if out is None:
            out = np.empty((size,), dtype=block.dtype)
        lo = b * block_size
        hi = min(size, lo + block_size)
        out[lo:hi] = block[: hi - lo]
    return out


def estimate(sink, size, block_size=16_777_216, random_state=None):
    """Streaming Monte Carlo estimate: mean/var/min/max of ``sink``.

    Numerically stable parallel-merge of per-block moments (Chan et al.);
    runs entirely on device, transferring only a handful of scalars per
    block.  Supports arbitrary ``size`` (e.g. 1e11) with O(block) memory.

    Returns a dict with n, mean, var, std, min, max.
    """
    plan, program = _block_program(sink, block_size)
    key = resolve_key(random_state)

    @jax.jit
    def block_stats(block_key, count):
        outputs, _ = program(block_key)  # Nested jit inlines into this one.
        x = outputs[plan.sink._id].astype(jnp.float32)
        valid = jnp.arange(x.shape[0]) < count
        n = count.astype(jnp.float32)
        mean = jnp.sum(jnp.where(valid, x, 0.0)) / n
        m2 = jnp.sum(jnp.where(valid, jnp.square(x - mean), 0.0))
        bmin = jnp.min(jnp.where(valid, x, jnp.inf))
        bmax = jnp.max(jnp.where(valid, x, -jnp.inf))
        return mean, m2, bmin, bmax

    n_blocks = -(-size // block_size)
    total_n = 0
    mean = 0.0
    m2 = 0.0
    vmin, vmax = np.inf, -np.inf
    for b in range(n_blocks):
        block_key = jax.random.fold_in(key, b)
        bn = min(block_size, size - total_n)
        bm, bss, bmin, bmax = jax.device_get(
            block_stats(block_key, jnp.int32(bn))
        )
        bm = float(bm)
        bss = float(bss)
        # Chan/Welford merge of per-block (mean, M2) pairs.
        delta = bm - mean
        new_n = total_n + bn
        mean = mean + delta * bn / new_n
        m2 = m2 + bss + delta * delta * total_n * bn / new_n
        total_n = new_n
        vmin = min(vmin, float(bmin))
        vmax = max(vmax, float(bmax))

    var = m2 / total_n if total_n else float("nan")
    return {
        "n": total_n,
        "mean": mean,
        "var": var,
        "std": var**0.5,
        "min": vmin,
        "max": vmax,
    }
