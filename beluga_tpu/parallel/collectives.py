"""Explicit collective building blocks for particle-axis sharding.

The reference has no distributed backend (SURVEY.md §2.5) — its only
parallelism is shared-memory PSTL.  Scaling a *single* filter beyond one
chip means sharding the particle axis across devices, and every reduction
in the filter loop becomes a collective.  ``parallel/fleet.py`` gets these
inserted automatically by XLA GSPMD from sharding annotations; this module
is the explicit ``shard_map`` formulation — useful when the automatic
layout is suboptimal and as the building blocks for hand-scheduled
multi-host pipelines (collectives ride ICI within a slice, DCN across).

All functions are written to run inside ``jax.shard_map`` with a named
particle axis; each shard holds a ``[N_local]`` slice of the particle
arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def sharded_logsumexp(log_w: Array, mask: Array, axis_name: str) -> Array:
    """Global logsumexp of masked log-weights across shards (scalar, replicated)."""
    neg = jnp.float32(-1e30)
    local_max = jnp.max(jnp.where(mask, log_w, neg))
    global_max = jax.lax.pmax(local_max, axis_name)
    local_sum = jnp.sum(jnp.where(mask, jnp.exp(log_w - global_max), 0.0))
    total = jax.lax.psum(local_sum, axis_name)
    return global_max + jnp.log(jnp.maximum(total, 1e-38))


def sharded_normalize(log_w: Array, mask: Array, axis_name: str) -> Array:
    """Weight normalization with a psum'd total (actions/normalize analog)."""
    total = sharded_logsumexp(log_w, mask, axis_name)
    return jnp.where(mask, log_w - total, -1e30)


def sharded_effective_sample_size(log_w: Array, mask: Array, axis_name: str) -> Array:
    """Global ESS = 1 / Σ ŵ² across shards."""
    norm = sharded_normalize(log_w, mask, axis_name)
    w = jnp.where(mask, jnp.exp(norm), 0.0)
    sq = jax.lax.psum(jnp.sum(w * w), axis_name)
    return 1.0 / jnp.maximum(sq, 1e-38)


def sharded_cdf(weights: Array, axis_name: str) -> tuple[Array, Array]:
    """Global normalized CDF over a sharded weight vector.

    Returns ``(local_cdf, offset)``: the shard's cumulative weights offset
    by the exclusive-prefix sum of preceding shards' totals, all scaled so
    the global total is 1. ``searchsorted(local_cdf + offset, u)`` then
    finds global draws landing in this shard.
    """
    local = jnp.cumsum(weights.astype(jnp.float32))
    local_total = local[-1]
    totals = jax.lax.all_gather(local_total, axis_name)  # [S]
    idx = jax.lax.axis_index(axis_name)
    offset = jnp.sum(jnp.where(jnp.arange(totals.shape[0]) < idx, totals, 0.0))
    grand = jnp.sum(totals)
    grand = jnp.maximum(grand, 1e-38)
    return local / grand, offset / grand


def sharded_systematic_resample(
    key: Array, weights: Array, axis_name: str, num_shards: int
) -> tuple[Array, Array]:
    """Globally stratified systematic resampling of a sharded particle vector.

    Every shard computes the same global stratified positions for *its own*
    output slots (the j-th shard owns global output slots
    ``[j*N_local, (j+1)*N_local)``), locates the donor's global index by
    searching the global CDF, and fetches remote donors through an
    all-gather of donor indices handled by the caller (the returned indices
    are *global*).  Returns ``(global_donor_idx [N_local], shard_of_donor
    [N_local])``.
    """
    n_local = weights.shape[0]
    local_cdf, offset = sharded_cdf(weights, axis_name)
    global_cdf = local_cdf + offset  # increasing within the shard

    # same u0 on every shard (key must be identical across shards)
    u0 = jax.random.uniform(key, (), jnp.float32)
    my_shard = jax.lax.axis_index(axis_name)
    total_out = n_local * num_shards
    slot0 = my_shard * n_local
    u = (slot0 + jnp.arange(n_local, dtype=jnp.float32) + u0) / total_out

    # global donor index: count how many global-CDF entries (across all
    # shards) are < u.  all_gather the shard CDF boundaries to locate the
    # owning shard, then searchsorted in the full gathered CDF.
    all_cdf = jax.lax.all_gather(global_cdf, axis_name)  # [S, N_local]
    flat = all_cdf.reshape(-1)
    gidx = jnp.clip(
        jnp.searchsorted(flat, u, side="right"), 0, total_out - 1
    ).astype(jnp.int32)
    donor_shard = gidx // n_local
    return gidx, donor_shard


def sharded_mean(values: Array, weights: Array, axis_name: str) -> Array:
    """Globally weighted mean of per-particle vectors ``[N_local, D]``."""
    w = weights.astype(jnp.float32)
    num = jax.lax.psum(jnp.sum(w[:, None] * values, axis=0), axis_name)
    den = jax.lax.psum(jnp.sum(w), axis_name)
    return num / jnp.maximum(den, 1e-38)
