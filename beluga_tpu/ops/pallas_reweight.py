"""Fully-fused Pallas likelihood-field reweight kernel with adaptive windows.

One kernel performs the whole per-(particle, beam) chain of
sensor/likelihood_field_model.hpp:68-91:

    endpoint transform -> cell index -> code-table lookup (int8 MXU)
    -> codebook decode -> out-of-map fallback -> ``1 + sum(pz^3)``

The only HBM traffic is the particle transforms in (16 B/particle) and the
weights out (4 B/particle).

**Adaptive windows.** The one-hot lookup costs (window area) MACs per
query.  Every beam endpoint lies within ``R = max |p|`` of its particle, so
each particle tile's queries live in a rectangle of the code table that the
kernel bounds from the tile's (tx, ty) extremes — converged clouds (normal
tracking) fit a 128x256 window (4.5x fewer MACs than the full 384^2
table), mid-spread clouds fit 256x256 (2.25x), and diverged clouds
(global localization) fall back to the full table.  The tier decision is
*per program* via ``pl.when`` — real branching per particle tile, even
inside a vmapped fleet (a ``lax.cond`` at the filter level would lower to
select under vmap and execute every branch).

**MXU codebook decode.** On the windowed tiers the 256-wide code->value
decode rides the MXU as a ``[8, K] @ [K, T]`` matmul against the codebook
split into three bf16 planes (bit-exact f32 reconstruction, the
truncation split of ops/pallas_resample.py) — measured ~20% faster than
the VPU select/reduce decode, which remains in use on the full-table tier
where the big int8 matmul saturates the MXU.

**Per-beam windows (fast path, opt-in via ``values3``).** For ONE beam
the queries only span (cloud span + |p_b| * theta-dispersion) cells —
typically ~20 cells for a converged cloud even when the scan itself
reaches the full sensor range, which is what forces the 128+-cell
tile-level windows above.  The fast path slices a [64, 128] *value*
window per beam:

  * per-beam origins and the exact span gate are precomputed in XLA and
    read from SMEM (no in-kernel reductions);
  * x origins are 8-sublane-aligned; y origins come from a TWIN TABLE —
    the value table stored twice along y, the second copy shifted by 64
    cells — so a 128-tall window at any 64-granular origin is a
    128-lane-aligned slice of one of the copies;
  * window entries are bf16(pz^3): the rows matmul returns pz^3 with no
    decode at all (<=0.2% relative weight error — the resolution of
    bf16, far below the sensor-model noise; the exact path remains the
    default).  Tiles whose per-beam spans exceed the window fall back to
    the exact tier path above, so global localization stays bit-exact.

Measured on v5e at B=64 x N=4096 x 60 beams (converged cloud,
full-range scan): exact tiers 6.5-6.9 ms -> fast path ~1.9 ms.

Out-of-map queries may clip outside the window: their looked-up value is
garbage but is always replaced by ``unknown_prob`` through the inside
mask, so window coverage only has to hold for in-map cells — which the
conservative bound guarantees.

Arithmetic order matches the XLA path bit-for-bit on the exact path:
``x = px*cos - py*sin + tx`` then ``floor(x / res)``, int8 code select
with integer accumulation, decode by codebook value.

Particles ride the lane axis in tiles of ``_TILE``; beams are a fori_loop
with the beam endpoint read from SMEM.  One filter per call — fleets
``vmap`` it (codes/book broadcast unbatched).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beluga_tpu.ops.pallas_resample import _split3

Array = jax.Array

_TILE = 4096  # particles per program (lane axis)
# (WW, WH) window tiers, largest first margin requirements:
#   x origin aligns to 8 sublanes, y origin to 128 lanes
# descending MAC cost; the kernel picks the cheapest tier that covers the
# tile (y windows are 128-lane-aligned, so spans over ~129 cells need the
# full-height tiers)
_TIERS = ((256, 384), (256, 256), (128, 384), (128, 256))
# per-beam window (x sublanes, y lanes) of the fast path
_BWW, _BWH = 64, 128
_YGRAN = 64  # y-origin granularity of the twin table
_XSLACK = 8  # x alignment waste + floor slack


def _make_kernel(h: int, w: int, n_book: int, num_beams: int, int8_path: bool,
                 fast: bool):
    """``h, w`` are the REAL map dims (the inside test); the code table may
    be padded to (8, 128)-aligned ``wp, hp`` — in-map queries never touch
    the padding and out-of-map values are replaced by ``unknown``."""

    def kernel(*refs):
        if fast:
            (scalars_ref, points_ref, orig_ref, tx_ref, ty_ref, cos_ref,
             sin_ref, codes_t_ref, book_ref, planes_ref, vals_t_ref,
             out_ref) = refs
        else:
            (scalars_ref, points_ref, tx_ref, ty_ref, cos_ref, sin_ref,
             codes_t_ref, book_ref, planes_ref, out_ref) = refs
        wp, hp = codes_t_ref.shape
        tiers = [(ww, wh) for ww, wh in _TIERS if ww <= wp and wh <= hp]
        t = tx_ref.shape[1]
        res = scalars_ref[0, 0]
        unknown = scalars_ref[0, 1]
        radius = scalars_ref[0, 2]
        fits_bw = scalars_ref[0, 3] > 0.0 if fast else jnp.asarray(False)

        tx = tx_ref[0, :][None, :]
        ty = ty_ref[0, :][None, :]
        cos = cos_ref[0, :][None, :]
        sin = sin_ref[0, :][None, :]
        book = book_ref[:]

        # conservative cell bounds of every query in this tile
        x_lo = jnp.floor((jnp.min(tx) - radius) / res).astype(jnp.int32)
        x_hi = jnp.floor((jnp.max(tx) + radius) / res).astype(jnp.int32)
        y_lo = jnp.floor((jnp.min(ty) - radius) / res).astype(jnp.int32)
        y_hi = jnp.floor((jnp.max(ty) + radius) / res).astype(jnp.int32)

        def endpoints(b):
            px = points_ref[0, b]
            py = points_ref[1, b]
            bm = points_ref[2, b]  # beam mask as 0/1 f32
            x = px * cos - py * sin + tx  # [1, T]
            y = px * sin + py * cos + ty
            xi = jnp.floor(x / res).astype(jnp.int32)
            yi = jnp.floor(y / res).astype(jnp.int32)
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            return bm, xi, yi, inside

        def run_beamwin():
            """Per-beam [64, 128] bf16(pz^3) windows; origins from SMEM."""
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (_BWW, t), 0)
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (_BWH, t), 0)
            unk3 = unknown * unknown * unknown

            def beam(b, acc):
                bm, xi, yi, inside = endpoints(b)
                x0 = pl.multiple_of(orig_ref[0, b], 8)
                o = orig_ref[1, b]
                off = pl.multiple_of(orig_ref[2, b], 128)
                vals_win = vals_t_ref[pl.ds(x0, _BWW), pl.ds(off, _BWH)]
                oh = ((yi - o) == iota_h).astype(jnp.bfloat16)
                rows = jax.lax.dot(
                    vals_win, oh, preferred_element_type=jnp.float32
                )  # [_BWW, T] = pz^3
                val = jnp.sum(
                    jnp.where((xi - x0) == iota_w, rows, 0.0),
                    axis=0, keepdims=True,
                )
                pz3 = jnp.where(inside, val, unk3)
                return acc + bm * pz3

            acc = jax.lax.fori_loop(
                0, num_beams, beam, jnp.zeros((1, t), jnp.float32)
            )
            out_ref[:] = 1.0 + acc

        def run(ww, wh, x0, y0):
            """Accumulate weights against the (x0, y0)+(ww, wh) window."""
            iota_w_win = jax.lax.broadcasted_iota(jnp.int32, (ww, t), 0)
            iota_h_win = jax.lax.broadcasted_iota(jnp.int32, (wh, t), 0)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_book, t), 0)
            if ww == wp and wh == hp:
                codes_win = codes_t_ref[:]
            else:
                codes_win = codes_t_ref[pl.ds(x0, ww), pl.ds(y0, wh)]
            # MXU decode on windowed tiers; VPU decode where the full-table
            # int8 matmul already saturates the MXU (measured crossover).
            # Also used in interpret mode so CPU tests cover the plane
            # reconstruction (it is bit-exact either way).
            mxu_decode = not (ww == wp and wh == hp)

            def beam(b, acc):
                bm, xi, yi, inside = endpoints(b)
                ohw = jnp.clip(yi, 0, h - 1) - y0
                ohx = jnp.clip(xi, 0, w - 1) - x0
                if int8_path:
                    oh = (ohw == iota_h_win).astype(jnp.int8)
                    rows = jax.lax.dot(
                        codes_win, oh, preferred_element_type=jnp.int32
                    )  # [WW, T]
                    code = jnp.sum(
                        jnp.where(ohx == iota_w_win, rows, 0),
                        axis=0, keepdims=True,
                    ) + 128
                else:
                    oh = (ohw == iota_h_win).astype(jnp.float32)
                    rows = jnp.dot(
                        codes_win, oh, preferred_element_type=jnp.float32
                    )
                    code = jnp.sum(
                        jnp.where(ohx == iota_w_win, rows, 0.0),
                        axis=0, keepdims=True,
                    ).astype(jnp.int32)
                if mxu_decode:
                    ohc = (code == iota_c).astype(jnp.bfloat16)  # [K, T]
                    planes = jax.lax.dot(
                        planes_ref[:], ohc, preferred_element_type=jnp.float32
                    )  # [8, T]: rows 0..2 = hi/mid/lo, bit-exact sum
                    val = planes[0:1, :] + planes[1:2, :] + planes[2:3, :]
                else:
                    val = jnp.sum(
                        jnp.where(code == iota_c, book, 0.0),
                        axis=0, keepdims=True,
                    )
                pz = jnp.where(inside, val, unknown)
                return acc + bm * (pz * pz * pz)

            acc = jax.lax.fori_loop(
                0, num_beams, beam, jnp.zeros((1, t), jnp.float32)
            )
            out_ref[:] = 1.0 + acc

        taken = fits_bw
        if fast:

            @pl.when(fits_bw)
            def _():
                run_beamwin()

        # tier selection: smallest window whose aligned origin still covers
        # the in-map part of [lo, hi]
        conds = []
        for ww, wh in tiers:
            # clip bounds are multiples of the alignment (w, h and the tier
            # sizes all are); pl.multiple_of makes that provable for Mosaic
            x0 = pl.multiple_of(jnp.clip((x_lo // 8) * 8, 0, wp - ww), 8)
            y0 = pl.multiple_of(jnp.clip((y_lo // 128) * 128, 0, hp - wh), 128)
            fits = (
                (jnp.maximum(x_lo, 0) >= x0)
                & (jnp.minimum(x_hi, w - 1) < x0 + ww)
                & (jnp.maximum(y_lo, 0) >= y0)
                & (jnp.minimum(y_hi, h - 1) < y0 + wh)
            )
            conds.append((fits, ww, wh, x0, y0))

        for i, (fits, ww, wh, x0, y0) in enumerate(reversed(conds)):
            # smallest tier first; each tier runs only if no smaller one fit
            use = fits & ~taken

            @pl.when(use)
            def _(ww=ww, wh=wh, x0=x0, y0=y0):
                run(ww, wh, x0, y0)

            taken = taken | fits

        @pl.when(~taken)
        def _():
            run(wp, hp, jnp.int32(0), jnp.int32(0))

    return kernel


def build_values3(codes: Array, codebook: Array) -> Array:
    """bf16 twin pz^3 table for the per-beam-window fast path.

    ``[wq, 2*hq]``: transposed (x sublanes, y lanes) value table padded to
    (8, 128) alignment, stored twice along y with the second copy shifted
    by ``_YGRAN`` cells.  Build once per map (builders cache it in ctx).
    """
    h, w = codes.shape
    wq = -(-w // 8) * 8
    hq = -(-h // 128) * 128
    vals3 = (codebook.astype(jnp.float32) ** 3)[codes]  # [H, W]
    vals_t = jnp.pad(vals3.T.astype(jnp.bfloat16), ((0, wq - w), (0, hq - h)))
    shifted = jnp.pad(vals_t[:, _YGRAN:], ((0, 0), (0, _YGRAN)))
    return jnp.concatenate([vals_t, shifted], axis=1)


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
    values3: Array | None = None,
) -> Array:
    """AMCL-parity weights ``1 + sum_b pz^3`` for one filter.

    Args:
      codes: i32[H, W] field code table; codebook: f32[K].
      tx/ty/cos/sin: f32[N] per-particle field-frame transform.
      points: f32[B, 2] beam endpoints (base frame); beam_mask: bool[B].
      values3: optional bf16 twin table from :func:`build_values3` —
        enables the per-beam-window fast path (<=0.2% weight error on
        converged tiles; exact elsewhere).
    Returns f32[N].
    """
    h, w = codes.shape
    k = codebook.shape[0]
    n = tx.shape[0]
    nb = points.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    fast = values3 is not None

    def pad(v):
        # edge-pad so the last tile's window bounds aren't widened to 0
        return jnp.pad(v.astype(jnp.float32), (0, n_pad - n), mode="edge")[None, :]

    pts = jnp.stack(
        [points[:, 0], points[:, 1], beam_mask.astype(jnp.float32)], axis=0
    )  # [3, B]
    radius = jnp.max(
        jnp.where(beam_mask, jnp.hypot(points[:, 0], points[:, 1]), 0.0)
    )

    wq = -(-w // 8) * 8
    hq = -(-h // 128) * 128
    res_f = jnp.asarray(resolution, jnp.float32)

    if fast:
        # exact per-beam query cell ranges (XLA fuses the [N, B] reduce)
        qx = (points[None, :, 0] * cos[:, None]
              - points[None, :, 1] * sin[:, None] + tx[:, None])
        qy = (points[None, :, 0] * sin[:, None]
              + points[None, :, 1] * cos[:, None] + ty[:, None])
        xi_min = jnp.floor(jnp.min(qx, axis=0) / res_f).astype(jnp.int32)
        xi_max = jnp.floor(jnp.max(qx, axis=0) / res_f).astype(jnp.int32)
        yi_min = jnp.floor(jnp.min(qy, axis=0) / res_f).astype(jnp.int32)
        yi_max = jnp.floor(jnp.max(qy, axis=0) / res_f).astype(jnp.int32)
        span_ok = ((xi_max - xi_min) <= (_BWW - _XSLACK)) & (
            (yi_max - yi_min) <= _YGRAN
        )
        fits_bw = jnp.all(jnp.where(beam_mask, span_ok, True))
        x0 = jnp.clip((xi_min // 8) * 8, 0, wq - _BWW)
        o = jnp.clip((yi_min // _YGRAN) * _YGRAN, 0, hq - _YGRAN)
        off = jnp.where(o % (2 * _YGRAN) == 0, o, hq + o - _YGRAN)
        origins = jnp.stack([x0, o, off], axis=0)  # i32 [3, B]
        gate = fits_bw.astype(jnp.float32)
    else:
        gate = jnp.float32(0.0)

    scalars = jnp.stack(
        [
            res_f,
            jnp.asarray(unknown_prob, jnp.float32),
            radius.astype(jnp.float32),
            gate,
        ]
    )[None, :]  # [1, 4]

    if interpret:
        codes_t = codes.T.astype(jnp.float32)
    else:
        # int8 x int8 -> int32 one-hot select: 2x the bf16 MXU rate on v5e
        # and integer-exact; interpret mode (CPU tests) lacks the int8 dot
        codes_t = (codes.T.astype(jnp.int32) - 128).astype(jnp.int8)
    # pad the table so window origins can align to (8, 128); the inside
    # test keeps the real dims, so padding values are never observed
    codes_t = jnp.pad(codes_t, ((0, wq - w), (0, hq - h)))

    # bit-exact 3-plane bf16 codebook split for the MXU decode
    planes3 = _split3(codebook.astype(jnp.float32)[None, :])  # [3, K]
    planes = jnp.zeros((8, k), jnp.bfloat16).at[0:3].set(planes3)

    kernel = _make_kernel(h, w, k, nb, int8_path=not interpret, fast=fast)

    tile_spec = lambda: pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((3, nb), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    inputs = [scalars, pts]
    if fast:
        in_specs.append(pl.BlockSpec((3, nb), lambda i: (0, 0), memory_space=pltpu.SMEM))
        inputs.append(origins)
    in_specs += [tile_spec(), tile_spec(), tile_spec(), tile_spec()]
    inputs += [pad(tx), pad(ty), pad(cos), pad(sin)]
    in_specs += [
        pl.BlockSpec((wq, hq), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [codes_t, codebook[:, None].astype(jnp.float32), planes]
    if fast:
        in_specs.append(
            pl.BlockSpec((wq, 2 * hq), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(values3)

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // _TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(*inputs)
    return out[0, :n]
