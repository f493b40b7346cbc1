"""Dense 3D distance voxel grids (the beluga_vdb map equivalent).

The reference's 3D extension stores an OpenVDB narrow-band level set whose
active values are distances to the nearest obstacle, with a background value
elsewhere (beluga_vdb/sensor/vdb_likelihood_field_model.hpp:112-152).  On
TPU the natural representation is a dense ``f32[D, H, W]`` distance volume
in HBM — gathers over millions of (particle, point) queries beat sparse
tree traversal, and a 200×200×50-voxel building floor is only ~8 MB.

The distance volume is built with the exact separable squared EDT extended
to 3D (three passes: column scans along z, then min-plus contractions along
y and x — see ops/distance_transform.py for the 2D version).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _dc(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dc
class DistanceGrid3:
    """Dense 3D distance-to-nearest-obstacle grid.

    Attributes:
      values: ``f32[D, H, W]`` distances in meters (indexed [z][y][x]).
      voxel_size: scalar f32 meters.
      origin_xyz: ``f32[3]`` world coordinates of voxel (0, 0, 0)'s center.
      background: scalar f32 distance reported outside the volume.
    """

    values: Array
    voxel_size: Array
    origin_xyz: Array
    background: Array

    def distance_at(self, points_world: Array, codes_book=None) -> Array:
        """Cell-centered lookup (worldToIndexCellCentered = round) of
        distances for ``f32[..., 3]`` world points.

        With ``codes_book`` (from :func:`make_distance_codes`) the lookup
        runs as an int8 one-hot MXU pass over the volume flattened to
        ``[H, D*W]`` — 3D random gathers serialize at ~5e7/s on v5e, the
        one-hot path does ~1e8-5e8/s depending on volume size.
        """
        idx = jnp.round((points_world - self.origin_xyz) / self.voxel_size).astype(
            jnp.int32
        )
        d, h, w = self.values.shape
        x, y, z = idx[..., 0], idx[..., 1], idx[..., 2]
        inside = (x >= 0) & (x < w) & (y >= 0) & (y < h) & (z >= 0) & (z < d)
        if codes_book is not None:
            from beluga_tpu.ops.pallas_lookup import pallas_codebook_lookup

            codes2d, book = codes_book
            yi = jnp.clip(y, 0, h - 1)
            xi = jnp.clip(z, 0, d - 1) * w + jnp.clip(x, 0, w - 1)
            vals = pallas_codebook_lookup(
                codes2d, book, yi, xi,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            vals = self.values[
                jnp.clip(z, 0, d - 1), jnp.clip(y, 0, h - 1), jnp.clip(x, 0, w - 1)
            ]
        return jnp.where(inside, vals, self.background)


def squared_distance_transform_3d(obstacle: Array, max_cells: float) -> Array:
    """Exact squared EDT (in cells²) of a ``bool[D, H, W]`` obstacle mask."""
    d, h, w = obstacle.shape
    big = jnp.float32(d + h + w + 1)

    # pass 1: per-(y, x) column distance along z
    zs = jnp.arange(d, dtype=jnp.float32)[:, None, None]
    above = jax.lax.cummax(jnp.where(obstacle, zs, -big), axis=0)
    below = -jax.lax.cummax(jnp.where(obstacle, -zs, -big), axis=0, reverse=True)
    g = jnp.minimum(zs - above, below - zs)
    g2 = jnp.minimum(jnp.square(g), jnp.square(max_cells))  # [D, H, W]

    # pass 2: min-plus along y for every (z, x)
    ys = jnp.arange(h, dtype=jnp.float32)
    py = jnp.square(ys[:, None] - ys[None, :])  # [H(y), H(y')]

    def minplus_y(slice_zx):  # [H, W] for fixed z
        return jnp.min(slice_zx[None, :, :] + py[:, :, None], axis=1)

    g2 = jax.lax.map(minplus_y, g2)

    # pass 3: min-plus along x for every (z, y)
    xs = jnp.arange(w, dtype=jnp.float32)
    px = jnp.square(xs[:, None] - xs[None, :])  # [W(x), W(x')]

    def minplus_x(slice_zy):  # [H, W] for fixed z
        return jnp.min(slice_zy[:, None, :] + px.T[None, :, :], axis=2)

    g2 = jax.lax.map(minplus_x, g2)
    return jnp.minimum(g2, jnp.square(max_cells))


def make_distance_grid(
    obstacle_mask: Array,
    voxel_size: float,
    origin_xyz=(0.0, 0.0, 0.0),
    max_distance: float = 100.0,
) -> DistanceGrid3:
    """Build the distance volume from a ``bool[D, H, W]`` obstacle mask."""
    max_cells = max_distance / voxel_size
    d2 = squared_distance_transform_3d(jnp.asarray(obstacle_mask), max_cells)
    dist = jnp.sqrt(d2) * voxel_size
    return DistanceGrid3(
        values=dist.astype(jnp.float32),
        voxel_size=jnp.float32(voxel_size),
        origin_xyz=jnp.asarray(np.asarray(origin_xyz, np.float32)),
        background=jnp.float32(max_distance),
    )


def make_distance_grid_from_points(
    points_xyz,
    voxel_size: float,
    padding_cells: int = 4,
    max_distance: float = 100.0,
) -> DistanceGrid3:
    """Build the map from an obstacle point cloud (the common VDB workflow:
    a scanned mesh/cloud voxelized into a level set)."""
    pts = np.asarray(points_xyz, np.float64)
    lo = pts.min(0) - padding_cells * voxel_size
    hi = pts.max(0) + padding_cells * voxel_size
    shape_xyz = np.ceil((hi - lo) / voxel_size).astype(int) + 1
    w, h, d = (int(s) for s in shape_xyz)
    mask = np.zeros((d, h, w), bool)
    idx = np.round((pts - lo) / voxel_size).astype(int)
    mask[idx[:, 2], idx[:, 1], idx[:, 0]] = True
    return make_distance_grid(mask, voxel_size, origin_xyz=lo, max_distance=max_distance)


def make_distance_codes(grid: DistanceGrid3, voxel_size: float,
                        background: float, max_codes: int = 256):
    """(codes i32[H, D*W], codebook f32[256]) for the one-hot 3D lookup.

    ``voxel_size`` and ``background`` are passed as host floats (reading
    them back off the grid pytree would flip remote sessions into
    synchronous mode, NOTES.md).  Distance values are ``sqrt(k) *
    voxel_size`` for integer k (exact 3D EDT) plus the background —
    typically far fewer than 256 distinct values, so the device-unique
    codebook is bit-exact; an analytic proposal (nearest-gap merged to
    256) covers the rest.
    """
    from beluga_tpu.ops.gather2d import build_device_codebook, encode_table

    d, h, w = grid.values.shape
    table2d = jnp.transpose(grid.values, (1, 0, 2)).reshape(h, d * w)

    voxel = float(voxel_size)
    bg = float(np.float32(background))
    kmax = int(min((bg / max(voxel, 1e-9)) ** 2, 4 * max_codes * max_codes)) + 1
    vals = np.unique(
        (np.sqrt(np.arange(kmax, dtype=np.float64)) * np.float32(voxel)).astype(
            np.float32
        )
    )
    vals = np.unique(np.concatenate([vals, [np.float32(bg)]]))
    while vals.size > max_codes:
        gaps = np.diff(vals)
        k = int(np.argmin(gaps))
        merged = np.float32(0.5 * (float(vals[k]) + float(vals[k + 1])))
        vals = np.concatenate([vals[:k], [merged], vals[k + 2:]])
    if vals.size < max_codes:
        vals = np.concatenate(
            [vals, np.full(max_codes - vals.size, vals[-1], np.float32)]
        )
    book = build_device_codebook(table2d, jnp.asarray(vals))
    return encode_table(table2d, book), book
