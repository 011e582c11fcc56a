"""Pallas megakernel executor: the whole DAG in one TPU kernel.

The standard engine path emits the graph as an XLA program; XLA fuses well,
but the uniform draws still cross HBM between the RNG and ppf stages and
transcendental-heavy chains split into several kernels.  For the common
production shape — ``method=None``, keep-sink-only — this executor
instead runs the ENTIRE sampling pass inside a single Pallas kernel,
gridded over sample blocks (correlated graphs add one cheap stats
kernel over the same stream; see ``_make_stats_kernel``):

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
    # Round-3 closed-form batch (ops/ppf.py): pure exp/log/power/tan/
    # ndtri/expm1_safe elementwise math, verified to lower in Mosaic.
    # Excluded on purpose: anglit (arcsin), wrapcauchy (arctan),
    # semicircular/cosine/foldnorm/foldcauchy/exponnorm (Newton bodies),
    # pearson3 (alpha = 4/skew^2 escapes the incomplete-gamma trip caps),
    # gennorm/halfgennorm (gammaincinv argument is 1/beta, ditto).
    "alpha",
    "bradford",
    "burr",
    "burr12",
    "dweibull",
    "exponpow",
    "exponweib",
    "fatiguelife",
    "genhalflogistic",
    "genlogistic",
    "gibrat",
    "gompertz",
    "halfcauchy",
    "halflogistic",
    "invweibull",
    "johnsonsb",
    "johnsonsu",
    "kappa3",
    "laplace_asymmetric",
    "levy",
    "levy_l",
    "loglaplace",
    "lomax",
    "mielke",
    "moyal",
    "powerlognorm",
    "powernorm",
    "trapezoid",
    "truncexpon",
    "truncpareto",
    "truncweibull_min",
    "tukeylambda",
    "reciprocal",
    # Second round-3 batch: tan (skewcauchy, like halfcauchy),
    # exp/log/expm1 (kappa4), ndtri+log (crystalball) all lower;
    # recipinvgauss/genexpon/kstwobign (Newton) and rel_breitwigner
    # (complex arithmetic) stay on the XLA path.
    "skewcauchy",
    "kappa4",
    "crystalball",
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
    # Round 3: the generic shape-cap check bounds every shape parameter
    # in (0, cap], which doubles as the gammaincinv-argument bound here
    # (and auto-excludes gengamma's c < 0 branch).
    "dgamma": 30.0,
    "loggamma": 30.0,
    "gengamma": 30.0,
    "rdist": 60.0,  # betaincinv(c / 2, c / 2, .)
    "argus": 60.0,  # gammaincinv(3/2, .) — trip count independent of chi
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

# Correlated graphs: cap on the number of correlated variables.  Each one
# adds a (512, 128) f32 score array to VMEM and K^2+K recolor scalars to
# SMEM; 16 keeps both comfortably bounded.
_MAX_CORR_K = 16


def supports(plan, keep_ids):
    """True if this graph can run as a Pallas megakernel.

    Correlated graphs are eligible too (sort-free Gaussian-copula
    Iman-Conover, see ``_make_stats_kernel``): correlation only requires
    that the correlated variables are univariate whitelisted
    distributions — which the per-node loop below already enforces —
    and that K stays small enough for VMEM/SMEM.
    """
    if plan.corr_matrix is not None and len(plan.corr_vars) > _MAX_CORR_K:
        return False
    # Any NARROW keep-set works (each kept node adds one VMEM output
    # block); the keep-everything default (gc_strategy=None) stays on
    # the XLA path, whose output-selection DCE is built for it.
    topo_ids = {node._id for node in plan.topo}
    if plan.sink._id not in keep_ids or not keep_ids <= topo_ids:
        return False
    if len(keep_ids) > 16:
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
            if _table_node_ok(node):
                continue  # Static-parameter discrete CDF-table families.
            return False
        if isinstance(node, _SAFE_TRANSFORMS):
            continue
        if _table_node_ok(node):
            continue  # Small numeric Discrete/Cumulative/Empirical tables.
        return False  # Marginal, string-valued/large tables, etc.
    return True


# Table-based families (Discrete/Cumulative/Empirical) evaluate as
# O(table) select TREES over host-constant knots — Mosaic has no
# vectorised gather/searchsorted, so a table costs ~2 VPU ops per knot
# per element regardless of shape.  The balanced tree keeps the
# dependency DEPTH at log2(knots), so the ops pipeline at VPU peak
# (a linear chain of dependent selects would stall ~4x at hundreds of
# knots).  Measured on v5e (round 3, wall-affine slope between 1e8 and
# 4e8 samples): a 471-knot poisson(mu=2000) tree runs at 0.33 ns/sample
# vs 0.04 ns/sample for the closed-form norm kernel — and vs
# 91 ns/sample for the SAME family through the XLA executor's
# searchsorted path (~280x).  Past this cap the O(knots) per-element
# work stops being competitive and the graph falls back to the XLA
# path (whose table cap is 4096, ops/ppf.py).
_TABLE_MAX = 512


def _select_tree(q, boundaries, leaf, strict):
    """``leaf(count)`` where ``count = #{b in boundaries : q > b}``.

    ``boundaries`` is a non-decreasing host-constant sequence (n of them,
    n + 1 leaves); ``strict=False`` counts ``q >= b`` instead.  Because
    the boundaries are sorted, the count equals the largest i with
    ``q > boundaries[i-1]``, so a balanced binary search tree of selects
    computes it with n comparisons + n selects at depth ceil(log2(n+1)) —
    the same op count as the naive chain but pipeline-friendly.

    ``leaf(i)`` returns the interval-i value (a scalar constant or an
    array shaped like ``q``); both subtrees of every node are evaluated
    (data-oblivious), as any TPU select network must.
    """

    def build(lo, hi):
        if hi - lo == 1:
            return leaf(lo)
        mid = (lo + hi) // 2
        b = jnp.float32(boundaries[mid - 1])
        cond = (q > b) if strict else (q >= b)
        return jnp.where(cond, build(mid, hi), build(lo, mid))

    return build(0, len(boundaries) + 1)


def _kernel_interp(q, xp, fp):
    """``jnp.interp(q, xp, fp)`` as a Mosaic-safe select tree.

    ``xp``/``fp`` are host-constant 1-D arrays (xp non-decreasing);
    outside [xp[0], xp[-1]] the result clamps to the endpoint values,
    matching ``jnp.interp``.  Duplicate knots produce the right-hand
    value for q at/past the jump (interval selection counts ``q >= x``,
    so equal knots collapse to the highest interval, exactly like the
    chain form this replaces).
    """

    def leaf(i):
        # Interval i: q in [xp[i-1], xp[i]) (i = 0: below xp[0]).
        if i == 0:
            return jnp.full(q.shape, jnp.float32(fp[0]))
        x0, x1 = float(xp[i - 1]), float(xp[i])
        f0, f1 = float(fp[i - 1]), float(fp[i])
        if x1 > x0:
            slope = (f1 - f0) / (x1 - x0)
            return jnp.float32(f0) + (q - jnp.float32(x0)) * jnp.float32(slope)
        return jnp.full(q.shape, jnp.float32(f1))

    val = _select_tree(q, [float(x) for x in xp[:-1]], leaf, strict=False)
    return jnp.where(q >= jnp.float32(xp[-1]), jnp.float32(fp[-1]), val)


_TRIMMED_TABLE_CACHE = {}


def _trimmed_cdf_table(node):
    """(f32 CDF table, loc) for a static discrete family, trimmed, or None.

    The f64 table is cast to f32 exactly as ``ppf._table_ppf`` does, then
    trimmed at BOTH ends to the reachable range of the kernel's clamped
    uniforms (q in [2^-24, 1 - 2^-24], ``_bits_to_open_unit``):

    * the tail is truncated after the first entry >= 1 - 2^-24 (the
      strict-< search can never select past it);
    * leading entries STRICTLY below 2^-24 always compare true
      (``q > entry`` for every clamped q), so they are dropped and their
      count folded into ``loc`` — exact for every reachable q.

    Both trims together keep large supports under the select-tree cap:
    poisson mu=400 shrinks 510 -> 356 reachable knots, mu=1000 fits at
    ~381.  Memoised by the node's static signature: eligibility checks
    (``supports``), ``_table_node_ok``, and the kernel emit would
    otherwise each rebuild the scipy table.
    """
    import numpy as np

    from probabilit_tpu.ops import ppf as _ppf

    cache_key = (node._static_signature(), jnp.dtype(config.float_dtype()).name)
    if cache_key in _TRIMMED_TABLE_CACHE:
        return _TRIMMED_TABLE_CACHE[cache_key]

    built = _ppf.static_cdf_table(node.distr, *node.args, **node.kwargs)
    if built is None:
        result = None
    else:
        table, loc = built
        t32 = np.asarray(table, np.float32)
        reachable = np.nonzero(t32 >= np.float32(1.0 - 2.0**-24))[0]
        if len(reachable):
            t32 = t32[: reachable[0] + 1]
        lead = int(np.searchsorted(t32, np.float32(2.0**-24), side="left"))
        lead = min(lead, len(t32) - 1)  # keep >= 1 entry
        result = (t32[lead:], loc + lead)
    if len(_TRIMMED_TABLE_CACHE) > 256:
        _TRIMMED_TABLE_CACHE.pop(next(iter(_TRIMMED_TABLE_CACHE)))
    _TRIMMED_TABLE_CACHE[cache_key] = result
    return result


def _kernel_table_ppf(q, table, loc):
    """``ppf._table_ppf`` (scipy convention) as a Mosaic select tree.

    ``searchsorted(table, q, side='left')`` counts entries < q, so the
    tree uses STRICT comparisons — the opposite boundary convention from
    ``_kernel_discrete`` (which matches the reference's side='right'
    DiscreteDistribution sampling).
    """
    boundaries = [float(t) for t in table[:-1]]
    val = _select_tree(
        q, boundaries, lambda i: jnp.float32(i), strict=True
    )
    return jnp.broadcast_to(val, q.shape) + jnp.float32(loc)


def _kernel_discrete(q, cumulative, values):
    """``values[searchsorted(cumulative, q, side='right')]`` via a select tree.

    Matches the XLA emit exactly (including the clamp to the last value):
    interval i (``q >= cumulative[i-1]``) yields ``values[i]``, which IS
    the right-sided rank of q in the cumulative table.
    """
    boundaries = [float(c) for c in cumulative[: len(values) - 1]]
    val = _select_tree(
        q, boundaries, lambda i: jnp.float32(values[i]), strict=False
    )
    return jnp.broadcast_to(val, q.shape)


def _kernel_table_emit(node):
    """Kernel-safe emit override for table-based families (or None).

    Returns None for any node `_table_node_ok` rejects, so the override
    can never silently emit the wrong semantics (e.g. linear interp for
    an Empirical table whose ``method=`` asks for exact quantiles) even
    if the caller's eligibility gating drifts.
    """
    import numpy as np

    from probabilit_tpu.models.distributions import (
        CumulativeDistribution,
        DiscreteDistribution,
        EmpiricalDistribution,
    )

    if not _table_node_ok(node):
        return None
    if isinstance(node, Distribution):
        table, loc = _trimmed_cdf_table(node)

        def emit(ctx):
            return _kernel_table_ppf(ctx.column(node), table, loc)

        return emit
    if isinstance(node, DiscreteDistribution):
        cumulative = np.cumsum(node.probabilities)
        values = node.values

        def emit(ctx):
            return _kernel_discrete(ctx.column(node), cumulative, values)

        return emit
    if isinstance(node, CumulativeDistribution):

        def emit(ctx):
            return _kernel_interp(ctx.column(node), node.q, node.cumulatives)

        return emit
    if isinstance(node, EmpiricalDistribution):
        sorted_data = np.sort(node.data)
        grid = np.linspace(0.0, 1.0, len(sorted_data))

        def emit(ctx):
            return _kernel_interp(ctx.column(node), grid, sorted_data)

        return emit
    return None


def _table_node_ok(node):
    """Megakernel eligibility for table-based distribution families."""
    import numpy as np

    from probabilit_tpu.models.distributions import (
        CumulativeDistribution,
        DiscreteDistribution,
        EmpiricalDistribution,
    )

    if isinstance(node, Distribution):
        built = _trimmed_cdf_table(node)
        return built is not None and len(built[0]) <= _TABLE_MAX
    if isinstance(node, DiscreteDistribution):
        return (
            np.issubdtype(node.values.dtype, np.number)
            and len(node.values) <= _TABLE_MAX
        )
    if isinstance(node, CumulativeDistribution):
        return len(node.q) <= _TABLE_MAX
    if isinstance(node, EmpiricalDistribution):
        return (
            np.issubdtype(node.data.dtype, np.number)
            and node.kwargs.get("method", "linear") == "linear"
            and all(k == "method" for k in node.kwargs)
            and len(node.data) <= _TABLE_MAX
        )
    return False


class _BlockContext:
    """EmitContext over (SUBLANES, LANES) VMEM blocks inside the kernel."""

    def __init__(self, columns, shape):
        self.n = shape  # jnp.full accepts the tuple; emits broadcast.
        self._columns = columns
        self._values = {}

    def value(self, node):
        nid = node._id
        if nid not in self._values:
            override = _kernel_table_emit(node)
            self._values[nid] = (
                override(self) if override is not None else node._emit(self)
            )
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


def _seed_block_prng(seed_ref):
    """Seed the hardware PRNG for this grid block.

    Both 32-bit words of the caller's key reach the PRNG, so
    fold_in-derived block keys keep their full 64-bit entropy
    (single-word seeding collides at ~k^2/2^33 over k blocks).
    Mosaic allows at most two seed words, so the block id is mixed
    into BOTH words through a murmur3-style avalanche.  A bare
    ``w0 ^ block_id`` is not enough: seeds 0 and 1 would then emit
    the same multiset of block streams, merely permuted (s ^ b
    ranges over the same set for any s).  Here ``w ^ b*odd`` is
    injective in b (odd multipliers are invertible mod 2^32) and
    the avalanche is a bijection, so blocks within a call always
    get distinct words, int seeds (word1 == 0) are injective
    overall, and cross-key collisions are ~2^-64 chance.
    """
    from probabilit_tpu.ops.hashing import fmix32

    b = jnp.uint32(pl.program_id(0))
    s0 = fmix32(jnp.uint32(seed_ref[0]) ^ (b * jnp.uint32(0xCC9E2D51)))
    s1 = fmix32(
        jnp.uint32(seed_ref[1])
        ^ (b * jnp.uint32(0x1B873593))
        ^ jnp.uint32(0x9E3779B9)
    )
    pltpu.prng_seed(s0, s1)


def _gen_order(plan):
    """Column generation order inside the kernels.

    Correlated variables draw FIRST (in ``plan.corr_vars`` order) so the
    stats pass (``_make_stats_kernel``) can regenerate exactly their
    uniforms by drawing only the first K columns of the same stream;
    everything else follows in plan order.  Uncorrelated plans keep the
    plain plan order.
    """
    corr_ids = [v._id for v in plan.corr_vars]
    corr_set = set(corr_ids)
    return corr_ids + [nid for nid in plan.col_of if nid not in corr_set]


def _make_kernel(plan, keep_order):
    topo = list(plan.topo)
    order = _gen_order(plan)
    corr_ids = [v._id for v in plan.corr_vars]
    by_id = {node._id: node for node in topo}
    keep_nodes = [by_id[nid] for nid in keep_order]
    K = len(corr_ids)

    def kernel(seed_ref, *refs):
        # Correlated graphs take a second SMEM operand: the flattened
        # recolor transform (A row-major, then b) computed by the stats
        # pass; see ``run``.
        ab_ref = refs[0] if K else None
        out_refs = refs[-len(keep_nodes):]
        _seed_block_prng(seed_ref)
        shape = (_SUBLANES, _LANES)
        columns = {}
        # Columns drawn in a fixed order: deterministic per (seed, block).
        for nid in order:
            bits = pltpu.prng_random_bits(shape)
            columns[nid] = _bits_to_open_unit(pltpu.bitcast(bits, jnp.uint32))

        from probabilit_tpu.ops import ppf as _ppf
        from probabilit_tpu.ops import special as _special
        from probabilit_tpu.ops.qmc import clamp_open_unit

        ctx = _BlockContext(columns, shape)
        if K:
            # Sort-free Gaussian-copula Iman-Conover (the same contract as
            # engine/compile.py's generated path): z = ndtri(u) are iid
            # normal scores; y = A z + b recolors them to the target
            # correlation with the empirical-decorrelation variance
            # reduction folded into A, b; Phi(y) re-enters each variable's
            # own inverse CDF as its quantile column (score-linear
            # families skip the roundtrip via the closed form in y).
            corr_nodes = list(plan.corr_vars)
            zs = [_special.ndtri_fast(columns[cid]) for cid in corr_ids]
            for i, cid in enumerate(corr_ids):
                y = jnp.float32(ab_ref[K * K + i])  # b_i, broadcasts
                for j in range(K):
                    y = y + jnp.float32(ab_ref[i * K + j]) * zs[j]
                val = _ppf.score_emit(corr_nodes[i], y, ctx)
                if val is None:
                    columns[cid] = clamp_open_unit(_special.ndtr_fast(y))
                else:
                    ctx._values[cid] = val
        # Route incomplete gamma/beta through the Mosaic-safe series/CF
        # implementations while the kernel body traces.
        with _special.kernel_safe_special():
            for node in topo:
                ctx.value(node)
            for node, out_ref in zip(keep_nodes, out_refs):
                # Constants and scalar-broadcasting transforms may emit
                # sub-block shapes; broadcast before the VMEM store.
                val = jnp.broadcast_to(
                    jnp.asarray(ctx.value(node)), (_SUBLANES, _LANES)
                )
                out_ref[:] = val.astype(out_ref.dtype)

    return kernel


def _make_stats_kernel(plan, n):
    """Pass-1 kernel for correlated graphs: score-moment accumulation.

    Draws ONLY the first K columns of each block's stream (identical bits
    to the main kernel: same seeding, same draw order), converts them to
    normal scores, and writes lane-partial sums of z_k and z_j z_k (upper
    triangle, row-major) — one (R, 128) block per grid step.  Elements at
    global index >= n (the padded tail) are masked out so the empirical
    moments cover exactly the returned samples.  XLA reduces the partials
    and solves the tiny K x K recolor transform; see ``run``.
    """
    K = len(plan.corr_vars)
    rows = K + K * (K + 1) // 2
    R = -(-rows // 8) * 8  # sublane-aligned output block

    def kernel(seed_ref, out_ref):
        _seed_block_prng(seed_ref)
        shape = (_SUBLANES, _LANES)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        base = pl.program_id(0) * (_SUBLANES * _LANES)
        mask = (base + row * _LANES + lane) < n

        from probabilit_tpu.ops import special as _special

        zs = []
        for _ in range(K):
            bits = pltpu.prng_random_bits(shape)
            u = _bits_to_open_unit(pltpu.bitcast(bits, jnp.uint32))
            zs.append(jnp.where(mask, _special.ndtri_fast(u), 0.0))
        parts = [jnp.sum(zs[k], axis=0, keepdims=True) for k in range(K)]
        for j in range(K):
            for k in range(j, K):
                parts.append(jnp.sum(zs[j] * zs[k], axis=0, keepdims=True))
        if len(parts) < R:
            parts.append(jnp.zeros((R - len(parts), _LANES), jnp.float32))
        partial = jnp.concatenate(parts, axis=0)

        # TPU grids run sequentially and a constant output index map keeps
        # this (R, 128) block VMEM-resident across every step, so the
        # whole stats pass accumulates in place: no (grid*R, 128) HBM
        # partials buffer (562 MB at n=1e9, K=10), no final reduction
        # over the grid axis.
        @pl.when(pl.program_id(0) == 0)
        def _init():
            out_ref[:] = partial

        @pl.when(pl.program_id(0) != 0)
        def _accumulate():
            out_ref[:] += partial

    return kernel, R


def _recolor_transform(plan, words, grid, n):
    """Run the stats pass and solve the (K, K) recolor transform.

    Returns the flattened ``[A row-major, b]`` SMEM operand such that
    ``y_i = b_i + sum_j A[i, j] z_j`` reproduces
    ``ImanConover._recolor_scores`` (empirical decorrelation of the iid
    scores, then recoloring to the target Cholesky factor) exactly, from
    accumulated moments instead of materialised scores.
    """
    import numpy as np

    from probabilit_tpu.ops.correlation import ImanConover

    K = len(plan.corr_vars)
    stats_kernel, R = _make_stats_kernel(plan, n)
    partials = pl.pallas_call(
        stats_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (R, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, _LANES), jnp.float32),
    )(words)
    sums = partials.sum(axis=1)  # (R,)

    # float32 matmul precision: TPU's DEFAULT rounds f32 MXU inputs to
    # bfloat16, which put ~1.5e-3 relative error into this K x K solve
    # (measured as a +3e-3 covariance bias on the returned samples).
    with jax.default_matmul_precision("float32"):
        nf = jnp.float32(n)
        mean = sums[:K] / nf
        iu = np.triu_indices(K)
        G = jnp.zeros((K, K), jnp.float32).at[iu].set(
            sums[K : K + K * (K + 1) // 2]
        )
        G = G + jnp.triu(G, 1).T
        cov = G / nf - jnp.outer(mean, mean)
        std = jnp.sqrt(jnp.diagonal(cov))
        emp_corr = cov / jnp.outer(std, std)
        L = jnp.linalg.cholesky(emp_corr)
        inv_L = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(K, dtype=jnp.float32), lower=True
        )
        # Target factor via set_target: same validation + clean error
        # contract as the XLA executor (e.g. PSD-singular repaired
        # matrices raise the correlator's ValueError, not a raw
        # LinAlgError).
        P = jnp.asarray(
            ImanConover().set_target(plan.corr_matrix).P, jnp.float32
        )
        A = (P @ inv_L) / std[None, :]
        b = -A @ mean
        return jnp.concatenate([A.reshape(-1), b])


def run(plan, seed, n, keep_ids=None):
    """Execute the megakernel; returns ``{node_id: (n,) array}``.

    ``seed`` is an int scalar or an array of up to two int32 words (e.g.
    both words of a JAX key); missing words are zero-padded.
    ``keep_ids`` (default: just the sink) selects which nodes' samples
    are written to HBM — each kept node is one extra VMEM output block,
    so narrow gc keep-lists stay on the megakernel path.

    Correlated plans run TWO kernels over the same hardware-PRNG stream:
    a cheap stats pass accumulating the correlated variables' score
    moments, then the main megakernel with the solved recolor transform
    spliced in as SMEM scalars.  Everything traces into one XLA program.
    """
    if config.float_dtype() != jnp.float32:
        raise ValueError("The pallas executor is float32-only.")
    if plan.corr_matrix is not None and n <= len(plan.corr_vars):
        # Same guard and message as the XLA executor (compile.py): a
        # degenerate empirical correlation would otherwise NaN the
        # Cholesky and return all-NaN samples silently.
        raise ValueError(
            "Inducing correlations needs more observations than "
            "variables (rows > columns); X has shape "
            f"({n}, {len(plan.corr_vars)})."
        )
    block = _SUBLANES * _LANES
    n_pad = -(-n // block) * block
    grid = n_pad // block

    words = jnp.reshape(jnp.asarray(seed, jnp.int32), (-1,))[:2]
    words = jnp.concatenate([words, jnp.zeros((2 - words.shape[0],), jnp.int32)])

    operands = [words]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    if plan.corr_matrix is not None:
        operands.append(_recolor_transform(plan, words, grid, n))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    # Deterministic keep order: sink last (so the single-output common
    # case keeps its historical layout), other kept nodes in topo order.
    if keep_ids is None:
        keep_ids = frozenset({plan.sink._id})
    keep_order = [
        node._id
        for node in plan.topo
        if node._id in keep_ids and node._id != plan.sink._id
    ]
    keep_order.append(plan.sink._id)

    kernel = _make_kernel(plan, keep_order)
    out_spec = pl.BlockSpec(
        (_SUBLANES, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((grid * _SUBLANES, _LANES), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[out_spec] * len(keep_order),
        out_shape=[out_shape] * len(keep_order),
    )(words, *operands[1:])
    return {
        nid: arr.reshape(-1)[:n] for nid, arr in zip(keep_order, outs)
    }


def run_jitted(plan, n, keep_ids=None, check_finite=True):
    """Jitted entry keyed by seed; cached by the caller per plan.

    Returns ``(outputs, finite_flag)`` — the same contract as
    ``compile.get_program``'s body.  Computing the all-finite flag inside
    the jitted program keeps the guard to a fused reduction — no second
    dispatch — so ``sample(executor="pallas")`` can enforce the same
    non-finite contract as the XLA path on every graph, not just
    correlated ones.  (A reserved string key in the outputs dict would
    not work: jit sorts pytree dict keys, and int node-ids don't compare
    with strings.)

    ``check_finite=False`` skips the reduction and returns a constant
    True flag — the A/B arm bench.py uses to price the guard (the
    production sampler always checks).
    """
    keep = None if keep_ids is None else frozenset(keep_ids)

    def fn(seed):
        outputs = run(plan, seed, n, keep)
        flag = jnp.bool_(True)
        if check_finite:
            for value in outputs.values():
                if value is not None and jnp.issubdtype(
                    value.dtype, jnp.inexact
                ):
                    flag = jnp.logical_and(flag, jnp.all(jnp.isfinite(value)))
        return outputs, flag

    return jax.jit(fn)


def environment_issue():
    """None if the current environment can run the megakernel, else the
    human-readable reason (platform / dtype / mesh).

    Single source of truth for the library-level gate: ``sampler.sample``
    raises the returned message on ``executor="pallas"``, and streaming's
    ``executor="auto"`` eligibility treats any reason as "fall back to
    the XLA executor".  (Graph eligibility is ``supports()``; this covers
    only the execution environment.)
    """
    from probabilit_tpu import config
    from probabilit_tpu.parallel import mesh as _par_mesh

    platform = jax.devices()[0].platform
    if platform != "tpu":
        return (
            "executor='pallas' requires a TPU backend "
            f"(current platform: {platform!r})."
        )
    if config.float_dtype() != jnp.float32:
        return "executor='pallas' is float32-only."
    if _par_mesh.current_mesh() is not None:
        return (
            "executor='pallas' does not run under a device mesh; "
            "use the default executor for sharded sampling."
        )
    return None
