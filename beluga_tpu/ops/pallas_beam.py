"""Fused sphere-tracing beam-model kernel (opt-in fast path).

The exact beam model marches Bresenham cell-by-cell — one serialized
gather per (ray, step) on TPU (~5e7/s), unusable at fleet scale; the CDDT
range LUT costs two gathers per beam plus a per-map build.  This kernel
instead *sphere-traces* the ray over the map's Euclidean distance
transform: at every position the EDT value D is a certified free radius,
so the ray can jump ``max(D - 1, 1)`` cells at once — open space is
crossed in a handful of steps, and each step's D lookup is an int8
one-hot MXU pass over the distance table held in VMEM (the same trick as
the likelihood-field kernel; no serialized gathers anywhere).

Approximation contract (why this is opt-in, ``use_sphere_trace=True``):
  * the traced ray is the continuous ray, not Bresenham's discrete line —
    corner-cutting cases can hit one cell earlier/later;
  * the hit distance is the marched arc length, within ~1 cell of the
    reference's centroid-to-centroid distance;
  * rays that exhaust the step budget before hitting or escaping are
    scored as misses (grazing-incidence worst case).
With ``sigma_hit`` ≈ 4 cells these errors move beam weights by far less
than the model's own noise terms; accuracy is gated by the same 0.9 m /
30° system test as the exact path.

The whole Thrun mixture (erf-normalized hit, short exponential, max,
random; beam_model.hpp:104-150) is evaluated in-kernel, so the output is
directly ``sum_b pz^3`` per particle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE = 2048  # particles per program (lane axis)
# default sphere-trace step budget: sufficient for short/medium-range
# regimes (<= ~10 m at 0.05 m cells); LONG-range maps need more — a ray
# nearing an obstacle's EDT basin shrinks to 1-cell jumps, and a beam
# that exhausts the budget silently scores max_range (measured: the
# 60 m / 1024-cell regime diverged at 20 steps, tracks at 48 —
# tests/test_system_long_range.py).  Callers pass ``march_steps``
# scaled to max_range / resolution.
_STEPS = 20


def _erf(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf (max abs err 1.5e-7).

    Mosaic has no erf lowering; this approximation perturbs the beam
    mixture's eta_hit by far less than the model's own tolerances."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def make_distance_cells(free_mask: Array) -> Array:
    """int8 table of clipped cell distances to the nearest non-free cell.

    ``floor(EDT)`` is a certified free radius (stored offset by -128 so the
    int8 one-hot select is exact).  Obstacle/unknown cells hold 0.
    """
    from beluga_tpu.ops.distance_transform import squared_distance_transform

    h, w = free_mask.shape
    d2 = squared_distance_transform(~free_mask, jnp.float32(1.0), float(h + w))
    d = jnp.floor(jnp.sqrt(d2)).astype(jnp.int32)
    d = jnp.clip(d, 0, 255)
    return (d - 128).astype(jnp.int8)


def _make_kernel(h: int, w: int, num_beams: int, int8_path: bool,
                 march_steps: int = _STEPS):
    def kernel(scalars_ref, beams_ref, tx_ref, ty_ref, cos_ref, sin_ref,
               dist_t_ref, out_ref):
        t = tx_ref.shape[1]
        res = scalars_ref[0, 0]
        max_range = scalars_ref[0, 1]
        z_hit = scalars_ref[0, 2]
        z_short = scalars_ref[0, 3]
        z_max = scalars_ref[0, 4]
        z_rand = scalars_ref[0, 5]
        sigma = scalars_ref[0, 6]
        lam = scalars_ref[0, 7]

        iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, t), 0)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, t), 0)

        # ray origin = source cell center (the reference measures hit
        # distances centroid-to-centroid, raycasting.hpp:100-103)
        px = jnp.floor(tx_ref[0, :][None, :] / res) + 0.5
        py = jnp.floor(ty_ref[0, :][None, :] / res) + 0.5
        cos = cos_ref[0, :][None, :]
        sin = sin_ref[0, :][None, :]
        max_cells = max_range / res

        def lookup_d(cx, cy):
            """EDT cell distance at float cell coords (0 outside the map)."""
            xi = jnp.floor(cx).astype(jnp.int32)
            yi = jnp.floor(cy).astype(jnp.int32)
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            ohy = jnp.clip(yi, 0, h - 1) == iota_h
            if int8_path:
                rows = jax.lax.dot(
                    dist_t_ref[:], ohy.astype(jnp.int8),
                    preferred_element_type=jnp.int32,
                )
                d = jnp.sum(
                    jnp.where(jnp.clip(xi, 0, w - 1) == iota_w, rows, 0),
                    axis=0, keepdims=True,
                ) + 128
            else:
                rows = jnp.dot(
                    dist_t_ref[:], ohy.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
                d = jnp.sum(
                    jnp.where(jnp.clip(xi, 0, w - 1) == iota_w, rows, 0.0),
                    axis=0, keepdims=True,
                ).astype(jnp.int32) + 128
            return jnp.where(inside, d, 0), inside

        def beam(b, acc):
            bx = beams_ref[0, b]  # unit bearing in base frame
            by = beams_ref[1, b]
            z = beams_ref[2, b]  # measured range (meters)
            bm = beams_ref[3, b]  # valid mask 0/1
            dx = bx * cos - by * sin  # ray direction per particle [1, T]
            dy = bx * sin + by * cos

            def step(_, carry):
                # hit/done ride as 0/1 f32 — i1 vector loop carries fail to
                # legalize in Mosaic's scf.for lowering
                dist, z_cells, hit, done = carry
                cx = px + dist * dx
                cy = py + dist * dy
                d, inside = lookup_d(cx, cy)
                hit_now = inside & (d == 0) & (done == 0.0)
                z_cells = jnp.where(hit_now, dist, z_cells)
                hit = jnp.maximum(hit, hit_now.astype(jnp.float32))
                stop = hit_now | ~inside | (dist > max_cells)
                done = jnp.maximum(done, stop.astype(jnp.float32))
                jump = jnp.maximum(d.astype(jnp.float32) - 1.0, 1.0)
                dist = dist + jnp.where(done > 0.0, 0.0, jump)
                return dist, z_cells, hit, done

            zeros = jnp.zeros((1, t), jnp.float32)
            dist0 = (zeros, zeros, zeros, zeros)
            _, z_cells, hit, _ = jax.lax.fori_loop(
                0, march_steps, step, dist0
            )
            z_mean = jnp.where(hit > 0.0, z_cells * res, max_range)
            z_mean = jnp.minimum(z_mean, max_range)

            # Thrun table 6.2 mixture (beam_model.hpp:125-147)
            sqrt2 = jnp.sqrt(jnp.float32(2.0))
            n_const = 1.0 / (jnp.sqrt(2.0 * jnp.pi) * sigma)
            eta_hit = 2.0 / (
                _erf((max_range - z_mean) / (sqrt2 * sigma))
                - _erf(-z_mean / (sqrt2 * sigma))
            )
            dz = (z - z_mean) / sigma
            pz = z_hit * eta_hit * n_const * jnp.exp(-0.5 * dz * dz)
            eta_short = 1.0 / (1.0 - jnp.exp(-lam * z_mean))
            pz = pz + jnp.where(
                z < z_mean, z_short * lam * eta_short * jnp.exp(-lam * z), 0.0
            )
            pz = pz + jnp.where(z < max_range, z_rand / max_range, z_max)
            return acc + bm * (pz * pz * pz)

        acc = jax.lax.fori_loop(
            0, num_beams, beam, jnp.zeros((1, t), jnp.float32)
        )
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "march_steps"))
def sphere_trace_beam_weights(
    dist_cells: Array,
    tx: Array,
    ty: Array,
    cos: Array,
    sin: Array,
    bearings: Array,
    ranges: Array,
    beam_mask: Array,
    resolution: Array,
    params_vec: Array,
    interpret: bool = False,
    march_steps: int = _STEPS,
) -> Array:
    """``sum_b pz^3`` per particle via sphere-traced expected ranges.

    Args:
      dist_cells: int8[H, W] from :func:`make_distance_cells`.
      tx/ty/cos/sin: f32[N] particle pose in the grid-local frame (meters).
      bearings: f32[B, 2] unit bearing vectors (base frame).
      ranges: f32[B] measured ranges; beam_mask: bool[B].
      params_vec: f32[7] = (beam_max_range, z_hit, z_short, z_max, z_rand,
        sigma_hit, lambda_short).
    Returns f32[N].
    """
    h, w = dist_cells.shape
    n = tx.shape[0]
    nb = bearings.shape[0]
    n_pad = -(-n // _TILE) * _TILE

    def pad(v):
        return jnp.pad(v.astype(jnp.float32), (0, n_pad - n), mode="edge")[None, :]

    beams = jnp.stack(
        [bearings[:, 0], bearings[:, 1], ranges.astype(jnp.float32),
         beam_mask.astype(jnp.float32)], axis=0
    )  # [4, B]
    scalars = jnp.concatenate(
        [resolution.astype(jnp.float32)[None], params_vec.astype(jnp.float32)]
    )[None, :]  # [1, 8]

    dist_t = dist_cells.T
    if interpret:
        dist_t = dist_t.astype(jnp.float32)
    kernel = _make_kernel(h, w, nb, int8_path=not interpret,
                          march_steps=march_steps)

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((4, nb), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(scalars, beams, pad(tx), pad(ty), pad(cos), pad(sin), dist_t)
    return out[0, :n]
