"""Precomputed range LUT for the beam sensor model (CDDT-style).

The exact beam model ray-marches per (particle, beam) — ~max_range /
resolution serialized lookups per ray.  Since the map is static, the range
to the first obstacle from any cell in any direction can be precomputed
*once per map load*:

    range_lut[yi, xi, k] = cast(cell (xi, yi) center, θ_k)

after which a beam evaluation is a single (bearing-interpolated: two)
table lookup — the same cost class as the likelihood-field model.  This is
the "compressed directional distance transform" idea (PAPERS.md: CDDT,
arXiv:1705.01167) realized as a dense TPU-friendly LUT.

Build cost: cells × bins rays through the existing lock-step Bresenham
(ops/raycast.py), amortized over every subsequent scan.  Accuracy: bearing
quantized to K bins with linear interpolation (both neighboring bins'
ranges are physically meaningful casts, so interpolation degrades
gracefully at occlusion boundaries); the source is snapped to the cell
center exactly like the reference's ``Ray2d`` (centroid-to-centroid
distances, raycasting.hpp:97-104).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OccupancyGrid
from beluga_tpu.models.sensor.beam import BeamModelParams
from beluga_tpu.ops.raycast import cast_rays

Array = jax.Array


def _dc(cls, meta=()):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls) if f.name not in meta]
    return jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=list(meta)
    )


@(lambda c: _dc(c, meta=("n_bearings", "max_range")))
class RangeLut:
    """``ranges[K, H, W]`` — cast distance per bearing bin from each cell
    center (max_range where the cast misses)."""

    ranges: Array
    resolution: Array
    origin_inv: SE2  # world -> grid-local
    n_bearings: int
    max_range: float


def build_range_lut(
    grid: OccupancyGrid,
    max_range: float,
    n_bearings: int = 64,
) -> RangeLut:
    """Precompute casts for every (cell, bearing bin).

    One jitted program: a ``lax.map`` over bearings, each iteration casting
    a whole-map plane of rays with the lock-step Bresenham (working set per
    bearing ≈ a few H×W planes; total output K×H×W).
    """
    h, w = grid.data.shape
    res_hint = grid.resolution_hint
    thetas = jnp.arange(n_bearings, dtype=jnp.float32) * (2.0 * jnp.pi / n_bearings)

    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * grid.resolution
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * grid.resolution
    gx = jnp.broadcast_to(xs[None, :], (h, w))
    gy = jnp.broadcast_to(ys[:, None], (h, w))
    src = jnp.stack([gx, gy], -1)  # [H, W, 2]

    @jax.jit
    def build(grid, src, thetas):
        def one_bearing(theta):
            d = jnp.broadcast_to(
                jnp.stack([jnp.cos(theta), jnp.sin(theta)]), (h, w, 2)
            )
            dist, hit = cast_rays(grid, src, d, max_range, resolution_hint=res_hint)
            return jnp.where(hit, dist, max_range).astype(jnp.float32)

        return jax.lax.map(one_bearing, thetas)  # [K, H, W]

    ranges = build(grid, src, thetas)
    return RangeLut(
        ranges=ranges,
        resolution=grid.resolution,
        origin_inv=grid.origin.inverse(),
        n_bearings=n_bearings,
        max_range=float(max_range),
    )


def beam_lut_weights(
    params: BeamModelParams,
    lut: RangeLut,
    states: SE2,
    points: Array,
    beam_mask: Array,
    lookup_mode: str = "auto",
    lut_bf16: Array | None = None,
) -> Array:
    """AMCL-parity beam weights ``Σ pz³`` using the range LUT; ``f32[N]``.

    Identical mixture math to models/sensor/beam.py (beam_model.hpp:104-148)
    with ``z_mean`` read from the LUT (bearing-interpolated) instead of
    ray-marched.  ``lut_bf16`` (from ops/pallas_beam_lut.build_lut_bf16)
    selects the windowed Pallas kernel on TPU — the fleet-scale fast path
    (no serialized gathers; out-of-window strays read max_range).
    """
    if lut_bf16 is not None and jax.default_backend() == "tpu":
        from beluga_tpu.ops.pallas_beam_lut import beam_lut_windowed

        local = lut.origin_inv @ states
        k, h, w = lut.ranges.shape
        xi = jnp.clip(
            jnp.floor(local.x / lut.resolution).astype(jnp.int32), 0, w - 1
        )
        yi = jnp.clip(
            jnp.floor(local.y / lut.resolution).astype(jnp.int32), 0, h - 1
        )
        z = jnp.linalg.norm(points, axis=-1)
        bearing = jnp.arctan2(points[:, 1], points[:, 0])
        mix = jnp.asarray(
            [params.z_hit, params.z_short, params.z_rand, params.z_max,
             params.sigma_hit, params.lambda_short, params.beam_max_range],
            jnp.float32,
        )
        return beam_lut_windowed(
            lut_bf16, local.theta, xi, yi, z, bearing, beam_mask,
            lut.max_range, mix,
        )
    from beluga_tpu.ops.gather2d import table_lookup

    z = jnp.linalg.norm(points, axis=-1)  # [B]
    beam_bearing = jnp.arctan2(points[:, 1], points[:, 0])  # [B]

    local = lut.origin_inv @ states  # SE2 [N]
    k, h, w = lut.ranges.shape

    xi = jnp.clip(jnp.floor(local.x / lut.resolution).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.floor(local.y / lut.resolution).astype(jnp.int32), 0, h - 1)

    # world bearing per (particle, beam), binned with wraparound interp
    theta = local.theta[:, None] + beam_bearing[None, :]  # [N, B]
    ft = jnp.mod(theta, 2.0 * jnp.pi) / (2.0 * jnp.pi) * k
    k0 = jnp.floor(ft).astype(jnp.int32) % k
    k1 = (k0 + 1) % k
    a = ft - jnp.floor(ft)

    flat = lut.ranges.reshape(k * h, w)
    yi_b = jnp.broadcast_to(yi[:, None], k0.shape)
    xi_b = jnp.broadcast_to(xi[:, None], k0.shape)
    r0 = table_lookup(flat, k0 * h + yi_b, xi_b, mode=lookup_mode)
    r1 = table_lookup(flat, k1 * h + yi_b, xi_b, mode=lookup_mode)
    z_mean = (1.0 - a) * r0 + a * r1  # [N, B]

    # --- the beam mixture (beam_model.hpp:125-147), verbatim math ---------
    sqrt2 = jnp.sqrt(jnp.float32(2.0))
    n_const = 1.0 / (jnp.sqrt(2.0 * jnp.pi) * params.sigma_hit)
    eta_hit = 2.0 / (
        jax.lax.erf((params.beam_max_range - z_mean) / (sqrt2 * params.sigma_hit))
        - jax.lax.erf(-z_mean / (sqrt2 * params.sigma_hit))
    )
    d = (z[None, :] - z_mean) / params.sigma_hit
    pz = params.z_hit * eta_hit * n_const * jnp.exp(-0.5 * d * d)
    eta_short = 1.0 / (1.0 - jnp.exp(-params.lambda_short * z_mean))
    pz = pz + jnp.where(
        z[None, :] < z_mean,
        params.z_short * params.lambda_short * eta_short
        * jnp.exp(-params.lambda_short * z[None, :]),
        0.0,
    )
    pz = pz + jnp.where(
        z[None, :] < params.beam_max_range,
        params.z_rand / params.beam_max_range,
        params.z_max,
    )
    pz3 = pz * pz * pz
    return jnp.sum(jnp.where(beam_mask[None, :], pz3, 0.0), axis=-1)
