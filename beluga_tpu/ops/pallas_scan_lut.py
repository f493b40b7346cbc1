"""Pallas shared-scan LUT build: all θ-bin correlations from VMEM.

The XLA build (models/sensor/likelihood_field_lut.py:build_scan_lut) rolls
the padded pz³ field through HBM four times per (θ bin, beam) — ~30 GB of
traffic for the default 128 bins × 60 beams.  The padded field is only
~1 MB, so this kernel keeps it VMEM-resident and performs every shifted
accumulation on-chip, writing just the K×Hp×Wp result to HBM.

The kernel is VPU-shuffle-bound (each ``pltpu.roll`` is ~1 elem/lane/
cycle), so the shape minimizes rotates per beam:

  * the three static one-cell corner rolls of bilinear sampling commute
    with the weighted beam sum — the loop accumulates the four
    corner-weighted sums of the *unshifted* ``r00`` image (2 dynamic
    rotates per beam) and the epilogue applies the three static rolls
    once per θ bin;
  * ``sampling="nearest"`` drops bilinear entirely (2 rotates + 1 FMA per
    beam): its ≤ half-cell sampling error is far below the LUT's own
    heading-quantization error for typical K, so it is the fast default
    for throughput work. ``"bilinear"`` matches the XLA build's numbers
    (same samples; beam sum reassociated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel_bilinear(shift_ref, weight_ref, field_ref, out_ref):
    nbeams = shift_ref.shape[1]
    field = field_ref[:]
    hp, wp = field.shape

    def add_beam(b, accs):
        acc_u, acc_v = accs
        r00 = pltpu.roll(
            pltpu.roll(field, shift=shift_ref[0, b, 0], axis=0),
            shift=shift_ref[0, b, 1],
            axis=1,
        )
        # x-lerp in the loop; the y+1 corner roll commutes with the beam
        # sum and moves to the epilogue (keeps the VMEM live set small)
        ax = weight_ref[0, b, 1]
        u = r00 + ax * (pltpu.roll(r00, shift=wp - 1, axis=1) - r00)
        ay = weight_ref[0, b, 2]
        wb = weight_ref[0, b, 0]
        return acc_u + (wb * (1.0 - ay)) * u, acc_v + (wb * ay) * u

    z = jnp.zeros_like(field)
    acc_u, acc_v = jax.lax.fori_loop(0, nbeams, add_beam, (z, z))
    out_ref[0] = acc_u + pltpu.roll(acc_v, shift=hp - 1, axis=0)


def _kernel_nearest(shift_ref, weight_ref, field_ref, out_ref):
    nbeams = shift_ref.shape[1]
    field = field_ref[:]

    def add_beam(b, acc):
        r = pltpu.roll(
            pltpu.roll(field, shift=shift_ref[0, b, 0], axis=0),
            shift=shift_ref[0, b, 1],
            axis=1,
        )
        return acc + weight_ref[0, b, 0] * r

    out_ref[0] = jax.lax.fori_loop(0, nbeams, add_beam, jnp.zeros_like(field))


def scan_lut_correlate(
    padded: Array,
    points: Array,
    beam_mask: Array,
    resolution: Array,
    n_theta: int,
    sampling: str = "bilinear",
    interpret: bool = False,
) -> Array:
    """Correlation maps ``f32[K, Hp, Wp]`` of ``padded`` with the scan.

    Args:
      padded: pz³ field already padded by the scan radius, ``f32[Hp, Wp]``.
      points: beam endpoints in the base frame, ``f32[B, 2]``.
      beam_mask: ``bool[B]`` (masked beams contribute nothing).
      resolution: meters per cell (traced scalar is fine).
      n_theta: number of heading bins K.
      sampling: ``"bilinear"`` (matches the XLA build) or ``"nearest"``
        (~2.5× faster; ≤ half-cell sampling error).
      interpret: run the kernel interpreted (CPU testing).
    """
    hp, wp = padded.shape
    nbeams = points.shape[0]

    thetas = jnp.arange(n_theta, dtype=jnp.float32) * (2.0 * jnp.pi / n_theta)
    c, s = jnp.cos(thetas)[:, None], jnp.sin(thetas)[:, None]
    ox = (c * points[None, :, 0] - s * points[None, :, 1]) / resolution
    oy = (s * points[None, :, 0] + c * points[None, :, 1]) / resolution
    m = beam_mask[None, :].astype(jnp.float32)

    if sampling == "bilinear":
        ix = jnp.floor(ox).astype(jnp.int32)
        iy = jnp.floor(oy).astype(jnp.int32)
        ax, ay = ox - ix, oy - iy
        weights = jnp.stack(
            [jnp.broadcast_to(m, ax.shape), ax, ay], axis=-1
        )  # [K, B, 3]
        kernel = _kernel_bilinear
        wcols = 3
    elif sampling == "nearest":
        ix = jnp.round(ox).astype(jnp.int32)
        iy = jnp.round(oy).astype(jnp.int32)
        # same SMEM layout as bilinear (width-1 SMEM blocks abort Mosaic)
        zero = jnp.zeros_like(ox)
        weights = jnp.stack([jnp.broadcast_to(m, ox.shape), zero, zero], axis=-1)
        kernel = _kernel_nearest
        wcols = 3
    else:
        raise ValueError(f"unknown sampling: {sampling!r}")

    # value at cell c comes from c + offset: shift content by -offset,
    # wrapped into [0, dim) (pltpu.roll requires non-negative shifts)
    shifts = jnp.stack([jnp.mod(-iy, hp), jnp.mod(-ix, wp)], axis=-1)  # [K, B, 2]

    return pl.pallas_call(
        kernel,
        grid=(n_theta,),
        out_shape=jax.ShapeDtypeStruct((n_theta, hp, wp), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, nbeams, 2), lambda k: (k, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, nbeams, wcols), lambda k: (k, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((hp, wp), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wp), lambda k: (k, 0, 0)),
        interpret=interpret,
    )(shifts, weights, padded)
