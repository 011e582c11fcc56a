"""Pallas megakernel executor: the whole DAG in one TPU kernel.

The standard engine path emits the graph as an XLA program; XLA fuses well,
but the uniform draws still cross HBM between the RNG and ppf stages and
transcendental-heavy chains split into several kernels.  For the common
production shape — ``method=None``, keep-sink-only, no correlations — this
executor instead runs the ENTIRE sampling pass inside a single Pallas
kernel, gridded over sample blocks:

* random bits come from the TPU's hardware PRNG (``pltpu.prng_random_bits``)
  seeded per block — no threefry math, no quantile buffer, zero HBM traffic
  except the final sink write;
* every ppf kernel and transform evaluates on VMEM-resident blocks via the
  same ``Node._emit`` machinery the XLA path uses, so the two executors
  share one source of truth for the math.

Eligibility is conservative (whitelisted closed-form distribution families,
arithmetic transforms only); ineligible graphs silently use the XLA path.
The random stream differs from the XLA path's threefry stream (both are
deterministic per seed), so this executor is opt-in:
``sample(..., executor="pallas")``.
"""

from __future__ import annotations

import numbers

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probabilit_tpu import config
from probabilit_tpu.models import graph as _graph
from probabilit_tpu.models.distributions import Distribution

__all__ = ["supports", "run"]

# Distribution families whose ppf kernels are pure jnp elementwise math
# (no host tables, no callbacks, no incomplete-function Newton loops).
_SAFE_FAMILIES = {
    "uniform",
    "norm",
    "expon",
    "lognorm",
    "triang",
    "truncnorm",
    "cauchy",
    "laplace",
    "logistic",
    "gumbel_r",
    "gumbel_l",
    "rayleigh",
    "halfnorm",
    "pareto",
    "weibull_min",
    "weibull_max",
    "powerlaw",
    "loguniform",
    "arcsine",
    "hypsecant",
    "fisk",
    "genpareto",
    "genextreme",
    "bernoulli",
    "geom",
    "randint",
}

# Families solved by Newton on Mosaic-safe incomplete gamma/beta functions
# (ops/special.py kernel_safe_special). The series/continued-fraction trip
# counts are sized for shape parameters up to these caps; larger (or
# composite, i.e. Node-valued) parameters fall back to the XLA path.
_INCOMPLETE_FAMILY_CAPS = {
    "gamma": 30.0,
    "invgamma": 30.0,
    "chi2": 60.0,  # gammaincinv(df / 2, .)
    "chi": 60.0,
    "maxwell": None,  # fixed shape a = 1.5
    "nakagami": 30.0,
    "beta": 30.0,
    "betaprime": 30.0,
    "t": 60.0,  # betaincinv(df / 2, .)
    "f": 60.0,
}


def _incomplete_family_ok(node):
    cap = _INCOMPLETE_FAMILY_CAPS[node.distr]
    shapes = list(node.args) + [
        v for k, v in node.kwargs.items() if k not in ("loc", "scale")
    ]
    for v in shapes:
        # numbers.Real admits numpy scalars (np.int64/np.float32) too;
        # bool is excluded (a bool shape parameter is a user error).
        if not isinstance(v, numbers.Real) or isinstance(v, bool):
            return False  # composite (Node) or exotic parameter
        if not 0 < float(v) <= (cap if cap is not None else float("inf")):
            return False
    return True


_SAFE_TRANSFORMS = (
    _graph.VariadicTransform,
    _graph.BinaryTransform,
    _graph.UnaryTransform,
)

_LANES = 128
_SUBLANES = 512  # block = 512 x 128 = 65536 samples


def supports(plan, keep_ids):
    """True if this graph can run as a Pallas megakernel."""
    if plan.corr_matrix is not None:
        return False
    if keep_ids != frozenset({plan.sink._id}):
        return False
    if isinstance(plan.sink, _graph.NoOp):
        return False
    for node in plan.topo:
        if isinstance(node, _graph.Constant):
            continue
        if isinstance(node, _graph.ScalarFunctionTransform):
            return False
        if isinstance(node, Distribution):
            if node.distr in _SAFE_FAMILIES:
                continue
            if node.distr in _INCOMPLETE_FAMILY_CAPS and _incomplete_family_ok(
                node
            ):
                continue
            return False
        if isinstance(node, _SAFE_TRANSFORMS):
            continue
        return False  # Empirical/Cumulative/Discrete/Marginal etc.
    return True


class _BlockContext:
    """EmitContext over (SUBLANES, LANES) VMEM blocks inside the kernel."""

    def __init__(self, columns, shape):
        self.n = shape  # jnp.full accepts the tuple; emits broadcast.
        self._columns = columns
        self._values = {}

    def value(self, node):
        nid = node._id
        if nid not in self._values:
            self._values[nid] = node._emit(self)
        return self._values[nid]

    def column(self, node):
        return self._columns[node._id]



def _bits_to_open_unit(bits):
    # Mosaic has no uint32->f32 cast; build the float directly: OR the top
    # 23 random bits into the mantissa of 1.0f, giving [1, 2), subtract 1.
    mantissa = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    u = pltpu.bitcast(mantissa, jnp.float32) - 1.0
    tiny = jnp.float32(2.0**-24)
    return jnp.clip(u, tiny, 1.0 - tiny)


def _make_kernel(plan):
    topo = list(plan.topo)
    col_of = dict(plan.col_of)
    sink = plan.sink

    def kernel(seed_ref, out_ref):
        block_id = pl.program_id(0)
        # Both 32-bit words of the caller's key reach the PRNG, so
        # fold_in-derived block keys keep their full 64-bit entropy
        # (single-word seeding collides at ~k^2/2^33 over k blocks).
        # Mosaic allows at most two seed words, so the block id is mixed
        # into BOTH words through a murmur3-style avalanche.  A bare
        # ``w0 ^ block_id`` is not enough: seeds 0 and 1 would then emit
        # the same multiset of block streams, merely permuted (s ^ b
        # ranges over the same set for any s).  Here ``w ^ b*odd`` is
        # injective in b (odd multipliers are invertible mod 2^32) and
        # the avalanche is a bijection, so blocks within a call always
        # get distinct words, int seeds (word1 == 0) are injective
        # overall, and cross-key collisions are ~2^-64 chance.
        b = jnp.uint32(block_id)

        def mix(h):
            h = h ^ (h >> jnp.uint32(16))
            h = h * jnp.uint32(0x85EBCA6B)
            h = h ^ (h >> jnp.uint32(13))
            h = h * jnp.uint32(0xC2B2AE35)
            return h ^ (h >> jnp.uint32(16))

        s0 = mix(jnp.uint32(seed_ref[0]) ^ (b * jnp.uint32(0xCC9E2D51)))
        s1 = mix(
            jnp.uint32(seed_ref[1])
            ^ (b * jnp.uint32(0x1B873593))
            ^ jnp.uint32(0x9E3779B9)
        )
        pltpu.prng_seed(s0, s1)
        shape = (_SUBLANES, _LANES)
        columns = {}
        # Columns drawn in plan order: deterministic per (seed, block).
        for nid in col_of:
            bits = pltpu.prng_random_bits(shape)
            columns[nid] = _bits_to_open_unit(pltpu.bitcast(bits, jnp.uint32))
        ctx = _BlockContext(columns, shape)
        # Route incomplete gamma/beta through the Mosaic-safe series/CF
        # implementations while the kernel body traces.
        from probabilit_tpu.ops import special as _special

        with _special.kernel_safe_special():
            for node in topo:
                ctx.value(node)
            out_ref[:] = ctx.value(sink).astype(out_ref.dtype)

    return kernel


def run(plan, seed, n):
    """Execute the megakernel; returns the sink's (n,) sample array.

    ``seed`` is an int scalar or an array of up to two int32 words (e.g.
    both words of a JAX key); missing words are zero-padded.
    """
    if config.float_dtype() != jnp.float32:
        raise ValueError("The pallas executor is float32-only.")
    block = _SUBLANES * _LANES
    n_pad = -(-n // block) * block
    grid = n_pad // block

    words = jnp.reshape(jnp.asarray(seed, jnp.int32), (-1,))[:2]
    words = jnp.concatenate([words, jnp.zeros((2 - words.shape[0],), jnp.int32)])

    kernel = _make_kernel(plan)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (_SUBLANES, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid * _SUBLANES, _LANES), jnp.float32),
    )(words)
    return out.reshape(-1)[:n]


def run_jitted(plan, n):
    """Jitted entry keyed by seed; cached by the caller per plan."""
    return jax.jit(lambda seed: run(plan, seed, n))
