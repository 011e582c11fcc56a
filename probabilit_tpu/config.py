"""Global configuration for probabilit-tpu.

The reference implementation (``/root/reference``) computes everything in
NumPy float64 on host. On TPU the natural compute dtype is float32 (the VPU
is a f32 machine and f64 is emulated), so the framework carries an explicit
sample dtype. The correctness contract versus the reference is *statistical*
(summary statistics to rtol ~1e-6 with enough samples), not bitwise.

Set ``PROBABILIT_TPU_X64=1`` (before import) or call ``set_dtype`` to use
float64 (useful on CPU when validating against SciPy).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

_FLOAT_DTYPE = None


def _default_dtype():
    if os.environ.get("PROBABILIT_TPU_X64", "0") == "1":
        jax.config.update("jax_enable_x64", True)
        return jnp.float64
    if jax.config.read("jax_enable_x64"):
        return jnp.float64
    return jnp.float32


def float_dtype():
    """The dtype used for sample arrays and quantiles."""
    global _FLOAT_DTYPE
    if _FLOAT_DTYPE is None:
        _FLOAT_DTYPE = _default_dtype()
    return _FLOAT_DTYPE


def set_dtype(dtype):
    """Set the global sample dtype (float32 or float64)."""
    global _FLOAT_DTYPE
    dtype = jnp.dtype(dtype)
    if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        raise ValueError(f"dtype must be float32 or float64, got {dtype}")
    # Keep jax_enable_x64 in lockstep both ways: leaving it on after a
    # float64 session would make JAX's default dtypes (python literals,
    # dtype-less arange) disagree with float_dtype()/int_dtype().
    jax.config.update("jax_enable_x64", dtype == jnp.dtype(jnp.float64))
    _FLOAT_DTYPE = dtype
    return dtype


def int_dtype():
    """Integer dtype matched to the float dtype width."""
    return jnp.int64 if float_dtype() == jnp.dtype(jnp.float64) else jnp.int32


def np_float_dtype():
    return np.dtype(float_dtype())
