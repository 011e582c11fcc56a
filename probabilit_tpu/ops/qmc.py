"""Quasi-Monte-Carlo sequence generators (Sobol, Halton, Latin Hypercube).

The reference delegates to ``scipy.stats.qmc`` (``modeling.py:479-489``).
Here the generators are index-addressable XLA programs: point ``i`` of
dimension ``j`` is a pure function of ``(i, j, key)``, so a chip holding
samples ``[a, b)`` of a sharded run computes exactly its own block with no
communication, and results are independent of the mesh shape.

* Sobol: digital (t,s)-sequence in base 2.  Direction numbers are generated
  at import from programmatically-found primitive polynomials over GF(2)
  with seeded odd initial values; randomisation is hash-based Owen
  scrambling (Laine-Karras style), applied per dimension.
* Halton: radical-inverse in the first d primes with a Cranley-Patterson
  random shift (scipy scrambles with digit permutations instead; both are
  unbiased randomisations).
* Latin hypercube: one random permutation per dimension, jittered.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from probabilit_tpu import config

__all__ = ["generate", "sobol", "halton", "latin_hypercube", "uniform"]

_MAX_BITS = 32


# =====================================================================
# Direction-number generation (host, once per dimension count)
# =====================================================================


def _primitive_polynomials(count):
    """First ``count`` primitive polynomials over GF(2), ascending degree.

    A polynomial is returned as an int bitmask including the leading and
    trailing 1 bits, e.g. x^3 + x + 1 -> 0b1011.
    """

    def polymulmod(a, b, mod, deg):
        # Multiply a*b in GF(2)[x] modulo ``mod`` (degree ``deg``).
        result = 0
        while b:
            if b & 1:
                result ^= a
            b >>= 1
            a <<= 1
            if a >> deg & 1:
                a ^= mod
        return result

    def x_pow_mod(e, mod, deg):
        # Compute x^e mod ``mod`` by square and multiply.
        result, base = 1, 2
        while e:
            if e & 1:
                result = polymulmod(result, base, mod, deg)
            base = polymulmod(base, base, mod, deg)
            e >>= 1
        return result

    def prime_factors(n):
        factors, p = set(), 2
        while p * p <= n:
            while n % p == 0:
                factors.add(p)
                n //= p
            p += 1
        if n > 1:
            factors.add(n)
        return factors

    found = []
    degree = 1
    while len(found) < count:
        order = (1 << degree) - 1
        factors = prime_factors(order)
        for poly in range(1 << degree, 1 << (degree + 1)):
            if not poly & 1:  # Constant term must be 1
                continue
            # Primitive iff ord(x) = 2^degree - 1 in GF(2)[x]/(poly).
            if x_pow_mod(order, poly, degree) != 1:
                continue
            if any(x_pow_mod(order // q, poly, degree) == 1 for q in factors):
                continue
            found.append((degree, poly))
            if len(found) == count:
                break
        degree += 1
    return found


def _splitmix64(x):
    """Language-independent counter hash (matches native/sobol.cpp)."""
    mask = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & mask
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
    return x ^ (x >> 31)


@functools.lru_cache(maxsize=8)
def _direction_numbers_np(d):
    """(d, 32) uint32 direction-number matrix for a d-dimensional Sobol.

    Cached as a NumPy array (never cache traced arrays across jit scopes).

    Dimension 0 is the van der Corput sequence; higher dimensions use the
    classic recurrence over primitive polynomials with odd initial values
    m_i < 2^i drawn from a splitmix64 counter hash (any odd choice yields
    a valid digital sequence; Owen scrambling randomises away quality
    differences).  The native C++ path (probabilit_tpu.native) computes a
    bit-identical table ~100x faster and is preferred when available.
    """
    from probabilit_tpu import native

    native_table = native.sobol_directions(d)
    if native_table is not None:
        return native_table

    V = np.zeros((d, _MAX_BITS), dtype=np.uint64)
    # First dimension: v_k = 2^(31-k).
    for k in range(_MAX_BITS):
        V[0, k] = 1 << (_MAX_BITS - 1 - k)

    if d > 1:
        polys = _primitive_polynomials(d - 1)
        for j, (s, poly) in enumerate(polys, start=1):
            # a-coefficients of the recurrence (exclude leading/trailing 1).
            a = [(poly >> (s - i)) & 1 for i in range(1, s)]
            m = [1] + [
                int((_splitmix64(j * 64 + i) % (1 << (i - 1))) * 2 + 1)
                for i in range(2, s + 1)
            ]
            m = m[:s]
            for k in range(s, _MAX_BITS):
                new = m[k - s] ^ (m[k - s] << s)
                for i in range(1, s):
                    if a[i - 1]:
                        new ^= m[k - i] << i
                m.append(new & 0xFFFFFFFF)
            for k in range(_MAX_BITS):
                V[j, k] = (m[k] << (_MAX_BITS - 1 - k)) & 0xFFFFFFFF
    return V.astype(np.uint32)


def _direction_numbers(d):
    return jnp.asarray(_direction_numbers_np(d))


# =====================================================================
# Bit manipulation (device)
# =====================================================================


def _reverse_bits32(x):
    x = ((x >> 16) & jnp.uint32(0x0000FFFF)) | ((x & jnp.uint32(0x0000FFFF)) << 16)
    x = ((x >> 8) & jnp.uint32(0x00FF00FF)) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    x = ((x >> 4) & jnp.uint32(0x0F0F0F0F)) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x >> 2) & jnp.uint32(0x33333333)) | ((x & jnp.uint32(0x33333333)) << 2)
    x = ((x >> 1) & jnp.uint32(0x55555555)) | ((x & jnp.uint32(0x55555555)) << 1)
    return x


def _owen_scramble(bits, seeds):
    """Hash-based nested-uniform (Owen) scrambling of radical-inverse bits.

    Laine-Karras style hash operating on bit-reversed integers; ``seeds``
    has one uint32 per dimension and broadcasts over the sample axis.
    """
    x = _reverse_bits32(bits)
    x = x + seeds
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return _reverse_bits32(x)


def _bits_to_unit(bits, dtype):
    if jnp.dtype(dtype) == jnp.dtype(jnp.float64):
        return clamp_open_unit(bits.astype(jnp.float64) * (2.0**-32))
    # 24 mantissa-safe bits for float32; guarantees values in [0, 1).
    return clamp_open_unit(
        (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0**-24)
    )


def clamp_open_unit(q):
    """Clamp quantiles into the OPEN interval (0, 1).

    Inverse CDFs of unbounded distributions map q=0 to -inf; under float32
    a [0,1) uniform hits exactly 0 once per ~2^24 draws, which at 1e8+
    samples is dozens of -inf/nan results per run (the f64 reference never
    sees this: P(0) ~ 2^-53).  The clamp shifts each endpoint by one ulp
    of the 24-bit grid — statistically invisible, numerically essential.
    """
    tiny = 2.0**-24 if q.dtype == jnp.float32 else 2.0**-53
    return jnp.clip(q, tiny, 1.0 - tiny)


def clamp_open_unit_wide(q):
    """Clamp to (0, 1) at the float's NORMAL-range floor, not the RNG grid.

    ``clamp_open_unit``'s 2^-24 floor is the resolution of generated
    float32 uniforms; quantiles COMPUTED by user graphs — importance
    tilts, survival-space windows — are legitimately far smaller and the
    wide ppf kernels (``ops.ppf.call_wide``) resolve them down to ~1e-37.
    The floor stays in the normal range because XLA flushes f32
    subnormals to zero, which would reintroduce -inf at q = 0.  The
    upper side is representation-limited either way (the largest f32
    below 1 is 1 - 2^-24).
    """
    if q.dtype == jnp.float32:
        return jnp.clip(q, jnp.float32(1e-37), jnp.float32(1.0 - 2.0**-24))
    return jnp.clip(q, 1e-300, 1.0 - 2.0**-53)


# =====================================================================
# Generators
# =====================================================================


def sobol(key, n, d, dtype=None, scramble=True, offset=0):
    """``n`` points starting at index ``offset`` of a d-dim Sobol sequence.

    ``offset`` may be a traced value (it only shifts the counter), so
    streamed/sharded runs generate exactly their own block inside one
    compiled program.  Sequence length is capped at 2^32 by the 32-bit
    radical inverse.
    """
    # Host-side normalisation before the trace boundary: ints >= 2^31
    # overflow int32 argument coercion, and the config dtype default
    # must not be burned into a trace cached under dtype=None.
    offset = _wrap_offset_uint32(offset)
    dtype = config.float_dtype() if dtype is None else dtype
    return _sobol_traced(key, n, d, jnp.dtype(dtype).name, scramble, offset)


@functools.partial(jax.jit, static_argnames=("n", "d", "dtype", "scramble"))
def _sobol_traced(key, n, d, dtype, scramble=True, offset=0):
    V = _direction_numbers(d)  # (d, 32)
    idx = jnp.arange(n, dtype=jnp.uint32) + jnp.asarray(offset, jnp.uint32)
    gray = idx ^ (idx >> 1)
    acc = jnp.zeros((n, d), dtype=jnp.uint32)
    for k in range(_MAX_BITS):
        bit = ((gray >> jnp.uint32(k)) & jnp.uint32(1)).astype(jnp.uint32)
        acc = acc ^ (bit[:, None] * V[None, :, k])
    if scramble:
        seeds = jax.random.randint(
            key, (d,), 0, np.iinfo(np.int32).max, dtype=jnp.int32
        ).astype(jnp.uint32)
        acc = _owen_scramble(acc, seeds[None, :])
    return _bits_to_unit(acc, dtype)


def _wrap_offset_uint32(offset):
    """Wrap a HOST-int offset into uint32 range before it reaches a trace.

    Python ints >= 2^31 (e.g. a block at the top of a 2^32-point stream)
    overflow JAX's default int32 argument coercion; uint32 index math is
    modular anyway, so wrapping preserves the intended counter value.
    Traced offsets pass through untouched.
    """
    if isinstance(offset, (int, np.integer)):
        return np.uint32(int(offset) % (1 << 32))
    return offset


@functools.lru_cache(maxsize=8)
def _first_primes(d):
    primes, candidate = [], 2
    while len(primes) < d:
        if all(candidate % p for p in primes):
            primes.append(candidate)
        candidate += 1
    return np.array(primes, dtype=np.int64)


def halton(key, n, d, dtype=None, scramble=True, offset=0):
    """``n`` points starting at index ``offset`` of a d-dim Halton sequence.

    ``offset`` may be traced; index arithmetic is 32-bit unless x64 is
    enabled, capping streamed sequences at 2^31 points in float32 mode.
    """
    if isinstance(offset, (int, np.integer)):
        # Host-side cap check before the trace boundary: unlike the
        # uint32 generators, wrapping here would silently REPEAT
        # earlier points (the digit loop is signed-index).
        bits = 64 if jax.config.read("jax_enable_x64") else 32
        if int(offset) >= 2 ** (bits - 1):
            raise ValueError(
                f"Halton streams are int{bits}-indexed: offset must be "
                f"< 2^{bits - 1}, got {int(offset)}."
            )
    # Resolve the config default HERE: inside the jit it would be burned
    # into a trace cached under dtype=None, surviving a config switch.
    dtype = config.float_dtype() if dtype is None else dtype
    return _halton_traced(key, n, d, jnp.dtype(dtype).name, scramble, offset)


@functools.partial(jax.jit, static_argnames=("n", "d", "dtype", "scramble"))
def _halton_traced(key, n, d, dtype, scramble=True, offset=0):
    primes = _first_primes(d)
    compute_dtype = jnp.float64 if jnp.dtype(dtype) == jnp.dtype(jnp.float64) else jnp.float32
    idx_dtype = jnp.int64 if jax.config.read("jax_enable_x64") else jnp.int32
    idx = jnp.arange(n, dtype=idx_dtype) + jnp.asarray(offset, idx_dtype)

    columns = []
    for j in range(d):
        base = int(primes[j])
        digits = int(np.ceil(np.log(2**31) / np.log(base)))
        i = idx
        f = 1.0 / base
        acc = jnp.zeros((n,), dtype=compute_dtype)
        for _ in range(digits):
            acc = acc + (i % base).astype(compute_dtype) * f
            i = i // base
            f = f / base
        columns.append(acc)
    pts = jnp.stack(columns, axis=1)
    if scramble:
        # Cranley-Patterson rotation: unbiased randomisation preserving
        # the low-discrepancy structure.
        shift = jax.random.uniform(key, (d,), dtype=compute_dtype)
        pts = jnp.mod(pts + shift[None, :], 1.0)
    return clamp_open_unit(pts.astype(dtype))


_FEISTEL_ROUNDS = 4

# Keyed murmur3-finalizer avalanche, shared with the other mixer call
# sites (ops/hashing.py).
from probabilit_tpu.ops.hashing import keyed_mix32 as _mix32  # noqa: E402


def _feistel_permutation(idx, round_keys, total):
    """Keyed bijection of [0, total): cycle-walking balanced Feistel.

    ``idx``: uint32 vector; ``round_keys``: (R,) uint32; ``total``:
    static int.  The Feistel network permutes [0, 2^m) for the smallest
    even m with 2^m >= total; out-of-domain images walk the permutation
    again (expected < 4 walks, geometric tail).  This is what makes
    Latin hypercube index-addressable: point i's stratum is a pure
    function of (i, key), so any block of a streamed/sharded run
    computes exactly its rows of the one global stratification
    (VERDICT r2 #8).

    Only lanes with ``idx < total`` cycle-walk.  The walk terminates for
    them because a bijection's cycle through an in-domain start must
    revisit it; a lane STARTING out of domain (a padding row past the
    end of a partial final block — every caller discards such rows) may
    sit on a cycle entirely inside [total, 2^m), where walking would
    spin the compiled while_loop forever (measured: ~4%% of keys at
    total=1000, block=1024).  Those lanes are frozen and clamped to
    stratum 0 instead.
    """
    if total <= 1:
        return jnp.zeros_like(idx)
    if total > 1 << 32:
        raise ValueError(
            f"LHS strata are uint32-indexed: total must be <= 2^32, got {total}."
        )
    m = max(2, int(np.ceil(np.log2(total))))
    m += m & 1  # even: balanced halves
    h = m // 2
    mask_h = jnp.uint32((1 << h) - 1)

    def feistel(v):
        L = (v >> jnp.uint32(h)) & mask_h
        R = v & mask_h
        for r in range(_FEISTEL_ROUNDS):
            L, R = R, L ^ (_mix32(R, round_keys[r]) & mask_h)
        return (L << jnp.uint32(h)) | R

    if total == 1 << 32:
        # Full uint32 domain: the network is already a bijection of it,
        # and the walk limit would not fit in uint32 anyway.
        return feistel(idx)

    limit = jnp.uint32(total)
    in_dom = idx < limit

    def cond(v):
        return jnp.any(in_dom & (v >= limit))

    def body(v):
        return jnp.where(in_dom & (v >= limit), feistel(v), v)

    out = jax.lax.while_loop(cond, body, feistel(idx))
    return jnp.where(in_dom, out, jnp.zeros_like(out))


def latin_hypercube(key, n, d, dtype=None, offset=0, total=None):
    """Latin hypercube sample: stratified keyed permutation per dimension.

    Index-addressable: row ``i`` is a pure function of ``(key, offset +
    i, j)`` — the stratum comes from a cycle-walking Feistel permutation
    of [0, total) and the in-stratum jitter from a murmur-mixed counter
    — so block ``b`` of a streamed run (``offset=b*block, total=size``)
    bitwise-equals rows [offset, offset+n) of the single-shot sample,
    and a sharded run computes exactly its own rows per chip.  ``total``
    defaults to ``n`` (the single-shot case).
    """
    dtype = config.float_dtype() if dtype is None else dtype
    total = n if total is None else int(total)
    if d == 0:
        return jnp.zeros((n, 0), dtype)
    offset = _wrap_offset_uint32(offset)
    return _latin_hypercube_traced(
        key, offset, n, d, jnp.dtype(dtype).name, total
    )


@functools.partial(jax.jit, static_argnames=("n", "d", "dtype", "total"))
def _latin_hypercube_traced(key, offset, n, d, dtype, total):
    rk = jax.random.bits(key, (d, _FEISTEL_ROUNDS + 1), dtype=jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.uint32) + jnp.asarray(offset, jnp.uint32)
    cols = []
    inv_total = jnp.asarray(1.0 / total, dtype)
    for j in range(d):
        strata = _feistel_permutation(idx, rk[j], total)
        # 24-bit jitter inside the stratum (counter-mixed, index-pure).
        u = (_mix32(idx, rk[j, _FEISTEL_ROUNDS]) >> jnp.uint32(8)).astype(
            dtype
        ) * jnp.asarray(2.0**-24, dtype)
        cols.append((strata.astype(dtype) + u) * inv_total)
    return clamp_open_unit(jnp.stack(cols, axis=1))


def uniform(key, n, d, dtype=None):
    """Pseudo-random quantiles (the method=None path), in (0, 1)."""
    dtype = config.float_dtype() if dtype is None else dtype
    return clamp_open_unit(jax.random.uniform(key, (n, d), dtype=dtype))


def antithetic(key, n, d, dtype=None, offset=0):
    """Antithetic pseudo-random quantiles: adjacent rows pair ``(u, 1-u)``.

    Classic first-order variance reduction (a capability the reference
    lacks; its ``method=`` accepts only lhs/halton/sobol,
    ``modeling.py:479-489``): every even global row ``2k`` draws a fresh
    counter-based uniform vector and row ``2k+1`` is its reflection
    ``1 - u``.  For any monotone statistic the pair members are
    negatively correlated, so with an even sample count the estimator
    variance drops below iid sampling — exactly to the ppf round-trip
    error for odd-symmetric pipelines (a normal's pair mean is the true
    mean up to ~1e-6).

    Index-addressable like the QMC engines: row ``i`` is a pure function
    of ``(key, offset + i)`` — the base uniform is threefry keyed by the
    PAIR index ``(offset + i) // 2`` — so streamed blocks bitwise-equal
    slices of the single-shot matrix and a sharded run computes exactly
    its own rows per chip (pairs straddling a block/shard boundary stay
    consistent because each member recomputes the shared pair uniform).
    """
    dtype = config.float_dtype() if dtype is None else dtype
    if d == 0:
        return jnp.zeros((n, 0), dtype)
    offset = _wrap_offset_uint32(offset)
    return _antithetic_traced(key, offset, n, d, jnp.dtype(dtype).name)


@functools.partial(jax.jit, static_argnames=("n", "d", "dtype"))
def _antithetic_traced(key, offset, n, d, dtype):
    compute_dtype = (
        jnp.float64 if jnp.dtype(dtype) == jnp.dtype(jnp.float64) else jnp.float32
    )
    gidx = jnp.arange(n, dtype=jnp.uint32) + jnp.asarray(offset, jnp.uint32)
    pair = gidx >> jnp.uint32(1)
    reflect = (gidx & jnp.uint32(1)).astype(jnp.bool_)

    def row(p):
        return jax.random.uniform(
            jax.random.fold_in(key, p), (d,), dtype=compute_dtype
        )

    u = jax.vmap(row)(pair)
    q = jnp.where(reflect[:, None], 1.0 - u, u)
    return clamp_open_unit(q.astype(dtype))


_METHODS = {
    "lhs": latin_hypercube,
    "halton": halton,
    "sobol": sobol,
    "antithetic": antithetic,
}


def generate(method, key, n, d, dtype=None, offset=0, total=None):
    """Quantile matrix for a named method (None/"lhs"/"halton"/"sobol"/
    "antithetic").

    ``offset`` starts the (index-addressable) sequence at a later point:
    block ``b`` of a streamed run passes ``offset=b*block_size`` and the
    concatenated blocks equal one long single-shot sequence exactly.
    ``total`` (LHS only) is the stratum count of the global sample the
    block belongs to; it defaults to ``n``.
    """
    if method is None:
        if not (isinstance(offset, int) and offset == 0):
            raise ValueError("offset requires an index-addressable QMC method.")
        return uniform(key, n, d, dtype)
    name = method.lower().strip()
    if name not in _METHODS:
        raise KeyError(f"Unknown sampling method: {method!r}")
    if d == 0:
        dtype = config.float_dtype() if dtype is None else dtype
        return jnp.zeros((n, 0), dtype)
    if name == "lhs":
        return latin_hypercube(key, n, d, dtype=dtype, offset=offset, total=total)
    return _METHODS[name](key, n, d, dtype=dtype, offset=offset)


def generate_sharded(method, key, n, d, dtype=None):
    """Generate with the sample axis sharded over the active mesh.

    Sobol/Halton/LHS points are pure functions of their index (LHS since
    the keyed-Feistel stratification), so constraining the output
    sharding inside jit lets the SPMD partitioner push the split back to
    the index iota: each chip computes exactly its own rows and the full
    (n, d) matrix never materialises on one device (SURVEY §2.3 "sharded
    QMC generation").  The no-method path falls back to
    generate-then-shard.
    """
    from probabilit_tpu.parallel import mesh as _mesh

    sharding = _mesh.sample_sharding(ndim=2)
    name = None if method is None else method.lower().strip()
    if sharding is None or name is None:
        return _mesh.shard_samples(generate(method, key, n, d, dtype))

    dtype = jnp.dtype(dtype or config.float_dtype()).name
    return _sharded_generator(name, n, d, dtype, sharding)(key)


@functools.lru_cache(maxsize=32)
def _sharded_generator(name, n, d, dtype, sharding):
    @jax.jit
    def _gen(key):
        pts = generate(name, key, n, d, dtype)
        return jax.lax.with_sharding_constraint(pts, sharding)

    return _gen
