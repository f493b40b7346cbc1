"""KLD-sampling adaptive particle count with static shapes.

The reference's ``take_while_kld`` (views/take_while_kld.hpp:72-137) lazily
consumes resampled particles while ``count <= min || count <=
target(distinct_buckets(count))`` and then caps at ``max``.  On TPU we draw
the full ``max`` candidates up front and compute the stop index with a
prefix scan:

  1. distinct-bucket prefix count K(i) via a stable sort of the spatial
     hashes (the sorted group leader is the first occurrence in input order),
  2. the closed-form chi-squared target size
     target(k) = ceil((k-1)/(2 eps) * (1 - 2/(9(k-1)) + sqrt(2/(9(k-1))) z)^3)
     with target(k <= 2) = +inf (take_while_kld.hpp:73-81),
  3. active count = index of the first violating element (it is excluded,
     exactly like take_while), clamped to [0, max].

The count changes; shapes never do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def distinct_prefix_count(hashes: Array) -> Array:
    """K[i] = number of distinct values among hashes[: i + 1]; ``i32[M]``."""
    m = hashes.shape[0]
    if jax.default_backend() == "tpu" and m <= 8192:
        # TPU sorts are expensive at these sizes; the O(M^2) triangular
        # "seen before" compare is pure VPU work and ~2.6x faster up to
        # ~8k particles (exact — verified against the sort path).
        return _distinct_prefix_count_triangular(hashes)
    order = jnp.argsort(hashes, stable=True)
    sorted_h = hashes[order]
    is_leader = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_h[1:] != sorted_h[:-1]]
    )
    first_occurrence = jnp.zeros((m,), bool).at[order].set(is_leader)
    return jnp.cumsum(first_occurrence.astype(jnp.int32))


def _distinct_prefix_count_triangular(hashes: Array, chunk: int = 512) -> Array:
    """first_occurrence[i] = not any_{j < i} hashes[j] == hashes[i]."""
    m = hashes.shape[0]
    pad = -(-m // chunk) * chunk - m
    h = jnp.pad(hashes, (0, pad))
    idx = jnp.arange(m)

    def body(c, seen):
        blk = jax.lax.dynamic_slice(h, (c * chunk,), (chunk,))
        j = c * chunk + jnp.arange(chunk)
        eq = (hashes[:, None] == blk[None, :]) & (j[None, :] < idx[:, None])
        return seen | jnp.any(eq, axis=1)

    seen = jax.lax.fori_loop(
        0, (m + pad) // chunk, body, jnp.zeros((m,), bool)
    )
    return jnp.cumsum((~seen).astype(jnp.int32))


def kld_target_size(k: Array, epsilon: float, z: float) -> Array:
    """Closed-form target sample count for k occupied buckets; f32 (inf for k<=2)."""
    kf = k.astype(jnp.float32)
    common = 2.0 / (9.0 * jnp.maximum(kf - 1.0, 1.0))
    base = 1.0 - common + jnp.sqrt(common) * z
    result = jnp.ceil((jnp.maximum(kf - 1.0, 1.0) / (2.0 * epsilon)) * base**3)
    return jnp.where(k <= 2, jnp.float32(jnp.inf), result)


def kld_active_count(
    hashes: Array, min_particles: int, max_particles: int, epsilon: float, z: float
) -> Array:
    """Number of candidates the sequential take-while would have kept."""
    m = hashes.shape[0]
    k = distinct_prefix_count(hashes)
    count = jnp.arange(1, m + 1, dtype=jnp.float32)
    keep = (count <= min_particles) | (count <= kld_target_size(k, epsilon, z))
    any_stop = jnp.any(~keep)
    first_stop = jnp.argmax(~keep)  # 0-based index of first excluded element
    n = jnp.where(any_stop, first_stop, m)
    return jnp.minimum(n, max_particles).astype(jnp.int32)
