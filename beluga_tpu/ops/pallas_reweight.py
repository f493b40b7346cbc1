"""Fully-fused Pallas likelihood-field reweight kernel.

One kernel performs the whole per-(particle, beam) chain of
sensor/likelihood_field_model.hpp:68-91:

    endpoint transform -> cell index -> code-table lookup (int8 MXU)
    -> codebook decode -> out-of-map fallback -> ``1 + sum(pz^3)``

The partially-fused path (ops/pallas_lookup.py) still materializes the
``[N, B]`` query indices and looked-up values in HBM (~500 MB per bench
reweight); here the only HBM traffic is the particle transforms in
(16 B/particle) and the weights out (4 B/particle).

Arithmetic order matches the XLA path bit-for-bit: ``x = px*cos - py*sin
+ tx`` then ``floor(x / res)``, int8 code select with integer
accumulation, decode by codebook value.

Particles ride the lane axis in tiles of ``_TILE``; beams are a
fori_loop with the beam endpoint read from SMEM.  One filter per call —
fleets ``vmap`` it (codes/book broadcast unbatched).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE = 4096  # particles per program (lane axis)


def _kernel(scalars_ref, points_ref, tx_ref, ty_ref, cos_ref, sin_ref,
            codes_t_ref, book_ref, out_ref):
    t = tx_ref.shape[1]
    w, h = codes_t_ref.shape
    num_beams = points_ref.shape[1]

    res = scalars_ref[0, 0]
    unknown = scalars_ref[0, 1]

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, t), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, t), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (book_ref.shape[0], t), 0)

    tx = tx_ref[0, :][None, :]
    ty = ty_ref[0, :][None, :]
    cos = cos_ref[0, :][None, :]
    sin = sin_ref[0, :][None, :]
    codes_t = codes_t_ref[:]
    book = book_ref[:]

    def beam(b, acc):
        px = points_ref[0, b]
        py = points_ref[1, b]
        bm = points_ref[2, b]  # beam mask as 0/1 f32
        x = px * cos - py * sin + tx  # [1, T]
        y = px * sin + py * cos + ty
        xi = jnp.floor(x / res).astype(jnp.int32)
        yi = jnp.floor(y / res).astype(jnp.int32)
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        yic = jnp.clip(yi, 0, h - 1)
        xic = jnp.clip(xi, 0, w - 1)
        oh = (yic == iota_h).astype(jnp.int8)
        rows = jax.lax.dot(codes_t, oh, preferred_element_type=jnp.int32)
        code = jnp.sum(jnp.where(xic == iota_w, rows, 0), axis=0, keepdims=True) + 128
        val = jnp.sum(jnp.where(code == iota_c, book, 0.0), axis=0, keepdims=True)
        pz = jnp.where(inside, val, unknown)
        return acc + bm * (pz * pz * pz)

    acc = jax.lax.fori_loop(
        0, num_beams, beam, jnp.zeros((1, t), jnp.float32)
    )
    out_ref[:] = 1.0 + acc


def _kernel_f32(scalars_ref, points_ref, tx_ref, ty_ref, cos_ref, sin_ref,
                codes_t_ref, book_ref, out_ref):
    # interpret-mode variant: f32 one-hot dot (CPU lacks int8 MXU lowering)
    t = tx_ref.shape[1]
    w, h = codes_t_ref.shape
    num_beams = points_ref.shape[1]
    res = scalars_ref[0, 0]
    unknown = scalars_ref[0, 1]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, t), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, t), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (book_ref.shape[0], t), 0)
    tx = tx_ref[0, :][None, :]
    ty = ty_ref[0, :][None, :]
    cos = cos_ref[0, :][None, :]
    sin = sin_ref[0, :][None, :]

    def beam(b, acc):
        px = points_ref[0, b]
        py = points_ref[1, b]
        bm = points_ref[2, b]
        x = px * cos - py * sin + tx
        y = px * sin + py * cos + ty
        xi = jnp.floor(x / res).astype(jnp.int32)
        yi = jnp.floor(y / res).astype(jnp.int32)
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        oh = (jnp.clip(yi, 0, h - 1) == iota_h).astype(jnp.float32)
        rows = jnp.dot(codes_t_ref[:], oh, preferred_element_type=jnp.float32)
        code = jnp.sum(
            jnp.where(jnp.clip(xi, 0, w - 1) == iota_w, rows, 0.0),
            axis=0, keepdims=True,
        ).astype(jnp.int32)
        val = jnp.sum(jnp.where(code == iota_c, book_ref[:], 0.0),
                      axis=0, keepdims=True)
        pz = jnp.where(inside, val, unknown)
        return acc + bm * (pz * pz * pz)

    acc = jax.lax.fori_loop(0, num_beams, beam, jnp.zeros((1, t), jnp.float32))
    out_ref[:] = 1.0 + acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_reweight(
    codes: Array,
    codebook: Array,
    tx: Array,
    ty: Array,
    cos: Array,
    sin: Array,
    points: Array,
    beam_mask: Array,
    resolution: Array,
    unknown_prob: Array,
    interpret: bool = False,
) -> Array:
    """AMCL-parity weights ``1 + sum_b pz^3`` for one filter.

    Args:
      codes: i32[H, W] field code table; codebook: f32[K].
      tx/ty/cos/sin: f32[N] per-particle field-frame transform.
      points: f32[B, 2] beam endpoints (base frame); beam_mask: bool[B].
    Returns f32[N].
    """
    h, w = codes.shape
    k = codebook.shape[0]
    n = tx.shape[0]
    nb = points.shape[0]
    n_pad = -(-n // _TILE) * _TILE

    def pad(v):
        return jnp.pad(v.astype(jnp.float32), (0, n_pad - n))[None, :]

    pts = jnp.stack(
        [points[:, 0], points[:, 1], beam_mask.astype(jnp.float32)], axis=0
    )  # [3, B]
    scalars = jnp.stack(
        [resolution.astype(jnp.float32), unknown_prob.astype(jnp.float32)]
    )[None, :]  # [1, 2]

    if interpret:
        codes_t = codes.T.astype(jnp.float32)
        kernel = _kernel_f32
    else:
        codes_t = (codes.T.astype(jnp.int32) - 128).astype(jnp.int8)
        kernel = _kernel

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, nb), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(scalars, pts, pad(tx), pad(ty), pad(cos), pad(sin), codes_t,
      codebook[:, None].astype(jnp.float32))
    return out[0, :n]
