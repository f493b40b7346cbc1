"""Experimental variants of the fused likelihood-field reweight kernel.

Variants under test (see NOTES.md session-4):
  A "hist":  accumulate per-code histograms across beams; decode once at
             the end with a single [1, K] @ [K, T] matmul (exact — the
             codebook decode is linear in the one-hot).
  B "bf16":  store bf16(book3[code]) values directly in the window table;
             the rows matmul returns pz^3 directly (no decode; ~0.4%
             value error from the bf16 table entries).
  C "hist2": hist variant with 2 beams per matmul dispatch
             ([WW, WH] @ [WH, 2T]) to halve loop overhead.

All share the adaptive-window tier logic of ops/pallas_reweight.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE = 4096
_TIERS = ((256, 384), (256, 256), (128, 384), (128, 256))


def _tier_prologue(scalars_ref, tx_ref, ty_ref, cos_ref, sin_ref):
    res = scalars_ref[0, 0]
    unknown = scalars_ref[0, 1]
    radius = scalars_ref[0, 2]
    tx = tx_ref[0, :][None, :]
    ty = ty_ref[0, :][None, :]
    cos = cos_ref[0, :][None, :]
    sin = sin_ref[0, :][None, :]
    x_lo = jnp.floor((jnp.min(tx) - radius) / res).astype(jnp.int32)
    x_hi = jnp.floor((jnp.max(tx) + radius) / res).astype(jnp.int32)
    y_lo = jnp.floor((jnp.min(ty) - radius) / res).astype(jnp.int32)
    y_hi = jnp.floor((jnp.max(ty) + radius) / res).astype(jnp.int32)
    return res, unknown, tx, ty, cos, sin, (x_lo, x_hi, y_lo, y_hi)


def _tier_dispatch(tiers, bounds, h, w, wp, hp, run):
    x_lo, x_hi, y_lo, y_hi = bounds
    conds = []
    for ww, wh in tiers:
        x0 = pl.multiple_of(jnp.clip((x_lo // 8) * 8, 0, wp - ww), 8)
        y0 = pl.multiple_of(jnp.clip((y_lo // 128) * 128, 0, hp - wh), 128)
        fits = (
            (jnp.maximum(x_lo, 0) >= x0)
            & (jnp.minimum(x_hi, w - 1) < x0 + ww)
            & (jnp.maximum(y_lo, 0) >= y0)
            & (jnp.minimum(y_hi, h - 1) < y0 + wh)
        )
        conds.append((fits, ww, wh, x0, y0))
    taken = jnp.asarray(False)
    for fits, ww, wh, x0, y0 in reversed(conds):
        use = fits & ~taken

        @pl.when(use)
        def _(ww=ww, wh=wh, x0=x0, y0=y0):
            run(ww, wh, x0, y0)

        taken = taken | fits

    @pl.when(~taken)
    def _():
        run(wp, hp, jnp.int32(0), jnp.int32(0))


def _make_kernel_hist(h, w, n_book, num_beams):
    """Variant A: per-beam code histogram, one decode matmul at the end."""

    def kernel(scalars_ref, points_ref, tx_ref, ty_ref, cos_ref, sin_ref,
               codes_t_ref, book3_ref, out_ref):
        wp, hp = codes_t_ref.shape
        tiers = [(ww, wh) for ww, wh in _TIERS if ww <= wp and wh <= hp]
        t = tx_ref.shape[1]
        res, unknown, tx, ty, cos, sin, bounds = _tier_prologue(
            scalars_ref, tx_ref, ty_ref, cos_ref, sin_ref
        )
        book3 = book3_ref[:]  # [K, 1] f32 (book values cubed)

        def run(ww, wh, x0, y0):
            iota_w_win = jax.lax.broadcasted_iota(jnp.int32, (ww, t), 0)
            iota_h_win = jax.lax.broadcasted_iota(jnp.int32, (wh, t), 0)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_book, t), 0)
            if ww == wp and wh == hp:
                codes_win = codes_t_ref[:]
            else:
                codes_win = codes_t_ref[pl.ds(x0, ww), pl.ds(y0, wh)]

            def beam(b, carry):
                hist, out_acc = carry
                px = points_ref[0, b]
                py = points_ref[1, b]
                bm = points_ref[2, b]
                x = px * cos - py * sin + tx
                y = px * sin + py * cos + ty
                xi = jnp.floor(x / res).astype(jnp.int32)
                yi = jnp.floor(y / res).astype(jnp.int32)
                inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                ohw = jnp.clip(yi, 0, h - 1) - y0
                ohx = jnp.clip(xi, 0, w - 1) - x0
                oh = (ohw == iota_h_win).astype(jnp.int8)
                rows = jax.lax.dot(
                    codes_win, oh, preferred_element_type=jnp.int32
                )
                code = jnp.sum(
                    jnp.where(ohx == iota_w_win, rows, 0), axis=0, keepdims=True
                ) + 128
                # dead code (masked or outside) -> bucket n_book (dropped)
                live = inside & (bm > 0.0)
                code = jnp.where(live, code, n_book)
                hist = hist + (code == iota_c).astype(jnp.float32)
                out_acc = out_acc + jnp.where(
                    bm > 0.0, jnp.where(inside, 0.0, unknown * unknown * unknown), 0.0
                )
                return hist, out_acc

            hist, out_acc = jax.lax.fori_loop(
                0, num_beams, beam,
                (jnp.zeros((n_book, t), jnp.float32), jnp.zeros((1, t), jnp.float32)),
            )
            # single decode: [1, K] @ [K, T]
            decoded = jax.lax.dot(
                book3.reshape(1, n_book), hist, preferred_element_type=jnp.float32
            )
            out_ref[:] = 1.0 + out_acc + decoded

        _tier_dispatch(tiers, bounds, h, w, wp, hp, run)

    return kernel


def _make_kernel_bf16(h, w, num_beams):
    """Variant B: bf16 pz^3-value table; rows matmul returns values."""

    def kernel(scalars_ref, points_ref, tx_ref, ty_ref, cos_ref, sin_ref,
               vals_t_ref, out_ref):
        wp, hp = vals_t_ref.shape
        tiers = [(ww, wh) for ww, wh in _TIERS if ww <= wp and wh <= hp]
        t = tx_ref.shape[1]
        res, unknown, tx, ty, cos, sin, bounds = _tier_prologue(
            scalars_ref, tx_ref, ty_ref, cos_ref, sin_ref
        )

        def run(ww, wh, x0, y0):
            iota_w_win = jax.lax.broadcasted_iota(jnp.int32, (ww, t), 0)
            iota_h_win = jax.lax.broadcasted_iota(jnp.int32, (wh, t), 0)
            if ww == wp and wh == hp:
                vals_win = vals_t_ref[:]
            else:
                vals_win = vals_t_ref[pl.ds(x0, ww), pl.ds(y0, wh)]

            def beam(b, acc):
                px = points_ref[0, b]
                py = points_ref[1, b]
                bm = points_ref[2, b]
                x = px * cos - py * sin + tx
                y = px * sin + py * cos + ty
                xi = jnp.floor(x / res).astype(jnp.int32)
                yi = jnp.floor(y / res).astype(jnp.int32)
                inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                ohw = jnp.clip(yi, 0, h - 1) - y0
                ohx = jnp.clip(xi, 0, w - 1) - x0
                oh = (ohw == iota_h_win).astype(jnp.bfloat16)
                rows = jax.lax.dot(
                    vals_win, oh, preferred_element_type=jnp.float32
                )  # [WW, T] = pz^3 values
                val = jnp.sum(
                    jnp.where(ohx == iota_w_win, rows, 0.0), axis=0, keepdims=True
                )
                pz3 = jnp.where(inside, val, unknown * unknown * unknown)
                return acc + bm * pz3

            acc = jax.lax.fori_loop(0, num_beams, beam, jnp.zeros((1, t), jnp.float32))
            out_ref[:] = 1.0 + acc

        _tier_dispatch(tiers, bounds, h, w, wp, hp, run)

    return kernel


def _prep(codes, tx, ty, cos, sin, points, beam_mask, resolution, unknown_prob):
    n = tx.shape[0]
    n_pad = -(-n // _TILE) * _TILE

    def pad(v):
        return jnp.pad(v.astype(jnp.float32), (0, n_pad - n), mode="edge")[None, :]

    pts = jnp.stack(
        [points[:, 0], points[:, 1], beam_mask.astype(jnp.float32)], axis=0
    )
    radius = jnp.max(
        jnp.where(beam_mask, jnp.hypot(points[:, 0], points[:, 1]), 0.0)
    )
    scalars = jnp.stack(
        [
            jnp.asarray(resolution, jnp.float32),
            jnp.asarray(unknown_prob, jnp.float32),
            radius.astype(jnp.float32),
        ]
    )[None, :]
    return n, n_pad, pad, pts, scalars


@jax.jit
def fused_reweight_hist(codes, codebook, tx, ty, cos, sin, points, beam_mask,
                        resolution, unknown_prob):
    h, w = codes.shape
    k = codebook.shape[0]
    nb = points.shape[0]
    n, n_pad, pad, pts, scalars = _prep(
        codes, tx, ty, cos, sin, points, beam_mask, resolution, unknown_prob
    )
    codes_t = (codes.T.astype(jnp.int32) - 128).astype(jnp.int8)
    wq = -(-w // 8) * 8
    hq = -(-h // 128) * 128
    codes_t = jnp.pad(codes_t, ((0, wq - w), (0, hq - h)))
    # histogram carries K+pad rows; bucket K holds dead lanes
    kq = -(-(k + 1) // 8) * 8
    book3 = jnp.pad((codebook.astype(jnp.float32) ** 3), (0, kq - k))
    kernel = _make_kernel_hist(h, w, kq, nb)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, nb), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((wq, hq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
    )(scalars, pts, pad(tx), pad(ty), pad(cos), pad(sin), codes_t, book3[:, None])
    return out[0, :n]


@jax.jit
def fused_reweight_bf16(codes, codebook, tx, ty, cos, sin, points, beam_mask,
                        resolution, unknown_prob):
    h, w = codes.shape
    nb = points.shape[0]
    n, n_pad, pad, pts, scalars = _prep(
        codes, tx, ty, cos, sin, points, beam_mask, resolution, unknown_prob
    )
    vals3 = (codebook.astype(jnp.float32) ** 3)[codes]  # [H, W] f32
    vals_t = vals3.T.astype(jnp.bfloat16)
    wq = -(-w // 8) * 8
    hq = -(-h // 128) * 128
    vals_t = jnp.pad(vals_t, ((0, wq - w), (0, hq - h)))
    kernel = _make_kernel_bf16(h, w, nb)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // _TILE,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, nb), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((wq, hq), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
    )(scalars, pts, pad(tx), pad(ty), pad(cos), pad(sin), vals_t)
    return out[0, :n]
