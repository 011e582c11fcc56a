"""Native multivariate sampling kernels.

The reference samples multivariate distributions through scipy ``.rvs``
with a seed derived from the node's first quantile
(``modeling.py:808-812``).  These kernels keep that seeding contract —
``key = PRNGKey(floor(q[0] * 2^20))`` — but draw on-device with
``jax.random``, so Dirichlet / multivariate-normal / multinomial nodes
fuse into the compiled program instead of bouncing through a host
callback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from probabilit_tpu import config

__all__ = ["lookup"]

_REGISTRY = {}


def _register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def lookup(name):
    return _REGISTRY.get(name)


def _key_from_q(q):
    # Reference seeding contract: one integer derived from the first
    # quantile of the node's column (modeling.py:811).
    seed = jnp.floor(q[0] * (2.0**20)).astype(jnp.int32)
    return jax.random.PRNGKey(seed)


@_register("multivariate_normal")
def multivariate_normal(q, shape, mean=None, cov=None, **_):
    n, d = shape
    dtype = config.float_dtype()
    mean = jnp.zeros((d,), dtype) if mean is None else jnp.asarray(mean, dtype)
    cov = jnp.eye(d, dtype=dtype) if cov is None else jnp.asarray(cov, dtype)
    # float32 matmul precision: TPU's DEFAULT rounds f32 MXU inputs to
    # bfloat16 (~1e-3 relative error on every sample's recoloring).
    with jax.default_matmul_precision("float32"):
        L = jnp.linalg.cholesky(cov)
        z = jax.random.normal(_key_from_q(q), (n, d), dtype)
        return mean + z @ L.T


@_register("dirichlet")
def dirichlet(q, shape, alpha, **_):
    n, d = shape
    dtype = config.float_dtype()
    alpha = jnp.asarray(alpha, dtype)
    return jax.random.dirichlet(_key_from_q(q), alpha, (n,), dtype)


@_register("multinomial")
def multinomial(q, shape, n=1, p=None, **_):
    rows, d = shape
    dtype = config.float_dtype()
    p = np.full(d, 1.0 / d) if p is None else p
    logits = jnp.log(jnp.asarray(p, dtype))
    # n independent categorical draws per row, counted per category.
    draws = jax.random.categorical(_key_from_q(q), logits, shape=(rows, int(n)))
    one_hot = jax.nn.one_hot(draws, d, dtype=dtype)
    return jnp.sum(one_hot, axis=1)
