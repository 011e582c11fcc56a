"""Direct generation of sorted uniforms (order statistics).

The classic identity: if E_1..E_{n+1} are iid Exp(1), then
``cumsum(E_1..E_n) / sum(E_1..E_{n+1})`` is distributed exactly as the
order statistics of n iid U(0,1) draws — a sorted uniform sample with no
sort.  Library utility (and the generation half of
``ImanConover._apply_generated``, the two-sort transform for pre-sorted
data); the production engine's correlated path no longer needs sorted
marginals at all — it uses the sort-free Gaussian-copula recoloring
(``engine/compile.py``), which this module's approach historically led
to.

float32 note: a flat cumsum over 1e8 terms carries O(sum * 2^-24) rounding
error — catastrophic relative to the ~1/n spacing.  We therefore do a
two-level (blocked) cumsum: exact-ish structure within 4096-element blocks
(partial sums ~4e3, error <<1 count) plus a block-offset prefix.  The
remaining drift is a smooth quantile warp of ~1e-5 at n=1e8 — far below
Monte Carlo noise at that scale and comparable to single-precision ppf
error itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sorted_uniforms"]

_BLOCK = 4096


def sorted_uniforms(key, rows, n, dtype=jnp.float32):
    """(rows, n) matrix whose rows are sorted U(0,1) order statistics."""
    blocks = -(-(n + 1) // _BLOCK)
    padded = blocks * _BLOCK

    u = jax.random.uniform(
        key, (rows, blocks, _BLOCK), dtype=dtype, minval=2.0**-24, maxval=1.0
    )
    e = -jnp.log(u)
    # Mask entries beyond n+1 so the denominator uses exactly n+1 draws.
    idx = jnp.arange(padded).reshape(blocks, _BLOCK)
    e = jnp.where(idx[None] < n + 1, e, 0.0)

    within = jnp.cumsum(e, axis=-1)
    block_totals = within[:, :, -1]
    offsets = jnp.cumsum(block_totals, axis=-1) - block_totals
    flat = (within + offsets[:, :, None]).reshape(rows, padded)

    total = flat[:, n]  # cumsum through the (n+1)-th exponential
    scale = 1.0 / total
    out = flat[:, :n] * scale[:, None]
    tiny = jnp.asarray(2.0**-24 if dtype == jnp.float32 else 2.0**-53, dtype)
    return jnp.clip(out, tiny, 1.0 - tiny)
