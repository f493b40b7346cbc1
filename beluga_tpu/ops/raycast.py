"""Vectorized ray casting over an occupancy grid.

The reference casts rays with a lazy Bresenham line iterator per
(particle, beam) and stops at the first non-free cell
(``algorithm/raycasting.hpp:44-115``, ``raycasting/bresenham.hpp``) —
inherently serial per ray.  The TPU formulation marches *all* N×B rays in
lock-step with a fixed-increment DDA inside ``lax.fori_loop``: each step is
one fused gather over the HBM-resident grid; hit bookkeeping is a masked
min-accumulate, so divergence costs nothing.

Semantics mirrored from the reference:
  * distances are measured centroid-to-centroid from the source cell
    (raycasting.hpp:97-104) and clamped to ``max_range``;
  * rays that leave the grid without hitting an obstacle are *misses*
    (trace is clipped to the grid, raycasting.hpp:86-87) — reported as
    ``hit=False`` (the beam model substitutes ``beam_max_range``);
  * a non-free source cell hits immediately at distance 0.

The step size is half a cell, which visits a superset of nothing/subset of
the Bresenham cells only at corner-cutting boundaries — within one cell of
the reference result (verified against a host-side Bresenham oracle in
tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beluga_tpu.maps.occupancy import OccupancyGrid

Array = jax.Array


def cast_rays(
    grid: OccupancyGrid,
    source_xy_local: Array,
    dir_xy_local: Array,
    max_range: float,
    step_cells: float = 0.5,
):
    """March rays through the grid.

    Args:
      grid: occupancy grid.
      source_xy_local: ``f32[..., 2]`` ray sources in grid-local coordinates.
      dir_xy_local: ``f32[..., 2]`` unit direction vectors (grid-local).
      max_range: maximum ray length in meters (static).
      step_cells: march increment as a fraction of a cell (static).

    Returns:
      (distance ``f32[...]``, hit ``bool[...]``): centroid-to-centroid
      distance to the first non-free cell (clamped to max_range) and whether
      anything was hit inside the grid.
    """
    res = grid.resolution
    step = step_cells * res
    num_steps = int(jnp.ceil(max_range / (step_cells * float(grid.resolution)))) + 1

    src_cell = grid.cell_near(source_xy_local)
    src_centroid = grid.coordinates_at(src_cell)

    free_grid = grid.free_mask  # bool[H, W]
    h, w = free_grid.shape

    def probe(t):
        pos = source_xy_local + t[..., None] * dir_xy_local
        cell = jnp.floor(pos / res).astype(jnp.int32)
        x, y = cell[..., 0], cell[..., 1]
        inside = (x >= 0) & (x < w) & (y >= 0) & (y < h)
        free = free_grid[jnp.clip(y, 0, h - 1), jnp.clip(x, 0, w - 1)]
        centroid = (cell.astype(jnp.float32) + 0.5) * res
        dist = jnp.linalg.norm(centroid - src_centroid, axis=-1)
        return inside, inside & ~free, dist

    shape = source_xy_local.shape[:-1]
    init = (
        jnp.full(shape, jnp.float32(max_range)),  # distance
        jnp.zeros(shape, bool),  # hit
        jnp.zeros(shape, bool),  # done (hit or exited the grid)
    )

    def body(i, carry):
        dist, hit, done = carry
        t = i * step
        inside, blocked, d = probe(jnp.full(shape, t, jnp.float32))
        new_hit = blocked & ~done
        dist = jnp.where(new_hit, jnp.minimum(d, max_range), dist)
        hit = hit | new_hit
        done = done | new_hit | ~inside
        return dist, hit, done

    dist, hit, _ = jax.lax.fori_loop(0, num_steps, body, init)
    return dist, hit
