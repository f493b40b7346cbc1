"""On-device resampling via prefix-sum + searchsorted.

The reference resamples by drawing from ``std::discrete_distribution`` one
particle at a time (views/sample.hpp:102-166) — multinomial with
replacement, inherently sequential.  The TPU formulation is the standard
inversion-by-CDF: normalized-weight cumulative sum, then a batch of
positions in [0, 1) mapped through ``searchsorted`` and a gather.  All four
classic strategies differ only in how the positions are generated:

  * multinomial: u_i ~ U[0,1) iid                      (reference behavior)
  * systematic:  u_i = (i + u) / M, one shared u
  * stratified:  u_i = (i + u_i) / M, iid u_i
  * residual:    floor(M w) deterministic copies + multinomial residuals

Dead slots carry zero weight and are therefore never selected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _cdf(weights: Array) -> Array:
    c = jnp.cumsum(weights.astype(jnp.float32))
    total = c[-1]
    return c / jnp.maximum(total, 1e-38)


def _counting_searchsorted(cdf: Array, positions: Array, chunk: int = 512) -> Array:
    """searchsorted(side='right') as a chunked compare-count.

    TPU lowers binary search to serialized gathers (~7e6 searches/s
    measured); counting ``#{k : cdf[k] <= u}`` is pure VPU work and runs
    ~7x faster at resampling sizes. Exact (integer counting).
    """
    n = cdf.shape[0]
    m = positions.shape[0]
    padded = -(-n // chunk) * chunk
    cdf_p = jnp.pad(cdf, (0, padded - n), constant_values=jnp.inf)

    def body(k, acc):
        keys = jax.lax.dynamic_slice(cdf_p, (k * chunk,), (chunk,))
        return acc + jnp.sum(
            positions[:, None] >= keys[None, :], axis=-1, dtype=jnp.int32
        )

    return jax.lax.fori_loop(0, padded // chunk, body, jnp.zeros(m, jnp.int32))


def _select(cdf: Array, positions: Array) -> Array:
    if jax.default_backend() == "tpu":
        idx = _counting_searchsorted(cdf, positions)
    else:
        idx = jnp.searchsorted(cdf, positions, side="right")
    return jnp.clip(idx, 0, cdf.shape[0] - 1).astype(jnp.int32)


def multinomial_positions(key: Array, num: int) -> Array:
    """iid positions — parity with views/sample.hpp's discrete_distribution."""
    return jax.random.uniform(key, (num,), jnp.float32)


def systematic_positions(key: Array, num: int) -> Array:
    u0 = jax.random.uniform(key, (), jnp.float32)
    # clamp below 1.0: (num-1+u0)/num rounds to exactly 1.0 in f32 for
    # u0 near 1 at large num (P ~ num * 2^-25 per draw), and downstream
    # interval kernels rely on u < 1.0 = cdf[-1] strictly
    return jnp.minimum(
        (jnp.arange(num, dtype=jnp.float32) + u0) / num,
        jnp.float32(1.0 - 2.0**-24),
    )


def stratified_positions(key: Array, num: int) -> Array:
    return jnp.minimum(
        (
            jnp.arange(num, dtype=jnp.float32)
            + jax.random.uniform(key, (num,), jnp.float32)
        ) / num,
        jnp.float32(1.0 - 2.0**-24),
    )


def sorted_multinomial_positions(key: Array, num: int) -> Array:
    """Uniform order statistics U_(1) < ... < U_(num), O(num), no sort.

    Via the uniform-spacings construction: iid exponentials E_1..E_{n+1},
    U_(i) = (E_1 + ... + E_i) / (E_1 + ... + E_{n+1}).  The resulting donor
    interval counts are *exactly* multinomial; only the draw order is
    sorted.  Sorted positions make the CDF search block-local, which is
    what the fused Pallas resample kernel needs (unsorted iid positions
    sweep every particle block: 220 ms vs 4.9 ms at 262k particles).
    """
    e = -jnp.log1p(-jax.random.uniform(key, (num + 1,), jnp.float32))
    # cummax: XLA's parallel cumsum can dip ~1 ulp at scan-block
    # boundaries; downstream kernels rely on sortedness
    s = jax.lax.cummax(jnp.cumsum(e))
    u = s[:-1] / jnp.maximum(s[-1], 1e-38)
    # f32 rounding can make the top ratio exactly 1.0 (P ≈ 1% at 262k),
    # which downstream interval kernels map to the (possibly dead) last
    # slot; clamp into [0, 1) per the contract
    return jnp.minimum(u, jnp.float32(1.0 - 2.0**-24))


def sorted_residual_multinomial_positions(key: Array, r0: Array, num: int) -> Array:
    """Positions for the residual slots of residual resampling.

    Slot ``j >= r0`` receives the ``(j - r0 + 1)``-th order statistic of
    ``num - r0`` iid uniforms (the spacings construction of
    :func:`sorted_multinomial_positions` with a dynamically-indexed
    denominator, since ``r0`` — the deterministic floor-copy count — is a
    traced scalar); slots ``j < r0`` receive 0.0 (their donors are
    overwritten with the deterministic copies by the caller).  Searching
    these positions in the residual CDF gives slots ``>= r0`` EXACTLY the
    multiset of ``num - r0`` multinomial draws from the residual
    distribution — the textbook residual resampler — where a fixed-index
    subset of ``num`` interleaved draws is only approximately so.  The
    output is sorted ascending (zeros first), as the fused kernel's block
    locality requires.
    """
    e = -jnp.log1p(-jax.random.uniform(key, (num + 1,), jnp.float32))
    s = jax.lax.cummax(jnp.cumsum(e))
    r0i = jnp.clip(r0.astype(jnp.int32), 0, num)
    # R = num - r0 residual draws; denominator = sum of the first R+1
    # spacings = s[R]
    denom = jnp.maximum(s[num - r0i], 1e-38)
    shifted = jnp.roll(s, r0i)[:num]  # slot j >= r0 reads s[j - r0]
    u = jnp.minimum(shifted / denom, jnp.float32(1.0 - 2.0**-24))
    slots = jnp.arange(num, dtype=jnp.float32)
    return jnp.where(slots < r0, 0.0, u)


def interleave_stride(m: int, rows: int = 512) -> tuple[int, int]:
    """Stride/group pair of the slot interleave: out[k] = in[(k % g)·r + k//g].

    Shared by :func:`interleave_slots` and the mega filter's rank
    permutation (parallel/mega.py) so both paths carry identical
    KLD-prefix statistics.  Capped near sqrt(m): r = m and r = 1 both
    degenerate to the identity."""
    r = min(rows, max(int(m**0.5), 1))
    while m % r:  # static: m and rows are trace-time constants
        r -= 1
    return r, m // r


def interleave_ranks(k: Array, m: int, rows: int = 512) -> Array:
    """Permuted rank for slot indices ``k`` — the index form of
    :func:`interleave_slots` (``out[k] = in[interleave_ranks(k)]``).

    When ``m`` has no divisor near sqrt(m) (prime capacities) the
    transpose stride degenerates to the identity and would silently
    re-censor the adaptive-KLD prefix; fall back to the full-cycle
    coprime stride permutation ``(k·s) % m`` (a bijection for prime m),
    which carries the same any-prefix-spans-the-CDF character."""
    r, g = interleave_stride(m, rows)
    if r == 1 and m > 4:
        s = max(int(m**0.5), 2)
        return (k * s) % m
    return (k % g) * r + k // g


def interleave_slots(x: Array, rows: int = 512) -> Array:
    """Reorder the leading axis by a [rows, cols] transpose.

    Applied to donors produced from sorted positions it spreads consecutive
    CDF regions across the slot axis, so any slot prefix (the KLD active
    prefix) covers the whole CDF near-uniformly — the same order character
    as systematic resampling.  A transpose, not a gather: costs ~1 ms where
    an unsort permutation gather costs ~40 ms at 262k rows.

    The stride is capped near sqrt(m): out[k] = in[(k % g) * r + k // g]
    with g = m / r, and both r = m and r = 1 degenerate to the identity —
    a fixed r = 512 was a NO-OP for m <= 512 (every donor stayed in CDF
    order, silently censoring small-filter KLD prefixes).
    """
    m = x.shape[0]
    r, _g = interleave_stride(m, rows)
    if r == 1 and m > 4:
        # prime m: the transpose is the identity — use the coprime stride
        # permutation instead (a gather, but only for the non-composite
        # capacities where the fast path cannot exist)
        return jnp.take(x, interleave_ranks(jnp.arange(m), m, rows), axis=0)
    # out[j] = in[(j % groups) * r + j // groups]: consecutive slots read
    # rank-stride r, so any prefix spans the whole sorted range
    lead = (m // r, r)
    return x.reshape(lead + x.shape[1:]).swapaxes(0, 1).reshape(x.shape)


def multinomial_indices(key: Array, weights: Array, num: int) -> Array:
    return _select(_cdf(weights), multinomial_positions(key, num))


def systematic_indices(key: Array, weights: Array, num: int) -> Array:
    return _select(_cdf(weights), systematic_positions(key, num))


def stratified_indices(key: Array, weights: Array, num: int) -> Array:
    return _select(_cdf(weights), stratified_positions(key, num))


def residual_indices(key: Array, weights: Array, num: int) -> Array:
    """Deterministic floor(M w) copies, multinomial over the residuals.

    Static shapes: every output slot j gets a donor — slots below the total
    deterministic count R0 come from repeating particles floor(M w_i) times
    (computed with a cumsum + searchsorted over integer counts); the rest are
    multinomial draws over the residual weights.
    """
    w = weights.astype(jnp.float32)
    w = w / jnp.maximum(jnp.sum(w), 1e-38)
    counts = jnp.floor(w * num)
    residual = w * num - counts
    cum_counts = jnp.cumsum(counts)
    r0 = cum_counts[-1]  # number of deterministic copies (dynamic scalar)

    slots = jnp.arange(num, dtype=jnp.float32)
    det_idx = jnp.clip(
        jnp.searchsorted(cum_counts, slots, side="right"), 0, w.shape[0] - 1
    ).astype(jnp.int32)

    res_cdf = jnp.cumsum(residual)
    res_cdf = res_cdf / jnp.maximum(res_cdf[-1], 1e-38)
    u = jax.random.uniform(key, (num,), jnp.float32)
    mult_idx = jnp.clip(
        jnp.searchsorted(res_cdf, u, side="right"), 0, w.shape[0] - 1
    ).astype(jnp.int32)

    return jnp.where(slots < r0, det_idx, mult_idx)


RESAMPLERS = {
    "multinomial": multinomial_indices,
    "systematic": systematic_indices,
    "stratified": stratified_indices,
    "residual": residual_indices,
}

# position-based strategies (eligible for the fused Pallas resample+copy
# kernel, ops/pallas_resample.py); residual needs its index construction
POSITIONERS = {
    "multinomial": multinomial_positions,
    "systematic": systematic_positions,
    "stratified": stratified_positions,
}
