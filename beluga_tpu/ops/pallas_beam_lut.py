"""Windowed range-LUT beam reweight: the fleet-scale beam-model kernel.

The CDDT-style range LUT (models/sensor/beam_lut.py) turns a beam
evaluation into table lookups, but at fleet scale the lookups are the
serialized-gather wall (~5e7 rows/s on v5e): 64 filters x 4096 particles
x 60 beams x 2 gathers would cost ~600 ms/step.  This kernel removes the
gathers with the same ideas as the likelihood-field fast path
(ops/pallas_reweight.py), plus one beam-model-specific observation: the
LUT index is ``(bearing bin, particle CELL)`` — and the cell is shared by
all beams of a particle.  So:

  1. per lane block (the strays-last layout of ops/pallas_reweight.py),
     DMA a ``[32, K, 128]`` x-major LUT window around the block's mean
     cell into VMEM, then assemble the flat ``[K, 4096]`` matmul operand
     with offset-free row stores (Mosaic cannot reshape/concat packed
     bf16 slices of a 3-D window — x-major storage makes each x-row a
     leading-index slice with trivial layout);
  2. ONE flattened-cell one-hot matmul ``[K, 4096] @ [4096, lanes]``
     yields ``colranges[k, n]`` — the cast range from particle n's cell
     in EVERY bearing bin — amortized over all beams;
  3. per beam, ``z_mean`` is a two-row select over the K sublanes of
     ``colranges`` (wraparound bearing interpolation), followed by the
     verbatim beam mixture (beam_model.hpp:125-147) on the VPU.

Out-of-window cells (strays; diverged clouds) read ``max_range`` — the
"cast misses" value.  This bounds the error (a stray scores as if all its
casts miss) but is NOT exact for diverged clouds, so the windowed path is
an opt-in tracking accelerator (``make_beam_filter(use_range_lut=
"windowed")``); the gather path and the exact ray-march remain the
defaults.  The block origins are centered on block mean cells computed in
XLA (no [N, beams] intermediates), exactly like the LF fast path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from beluga_tpu.ops.pallas_beam import _erf
from beluga_tpu.ops.pallas_reweight import _BLOCKS, _TILE

Array = jax.Array

# Cell window: 32 x-rows (sublanes) by 128 y-cells (one native lane
# width).  The y extent being exactly 128 lanes lets stage 1 DMA each
# x-row of the window straight into a flat [K, CWX*CWY] VMEM operand at a
# 128-aligned lane offset — no in-vector reshape/concatenate, which
# Mosaic cannot lower for packed bf16 slices of a 3-D window (the
# "result/input offset mismatch" / "unsupported shape cast" failures).
_CWX = 40  # window x extent (leading/untiled axis of the x-major LUT)
_CWY = 128  # window y extent (lane axis)


_CHUNK = 256  # lane chunk of the stage-1 one-hot matmul (divides every block)

# Stage-2 band: rows of col the bin select runs over when a block's theta
# spread allows it (vs all K rows).  The block-mean bin lands _BAND_O..
# _BAND_O+7 rows into the band (floor-8 origin), leaving coverage for
# per-particle bin deviations up to _DEV_MAX (+1 floor carry is absorbed
# by the margin analysis: lower 23-22-1 >= 0, upper 30+22+1+1 <= _BAND-2).
# Sized from the bench replay: tracking-block dev is 18-19 bins at K=128
# (process noise), so a 40-row band never engages; 56 covers it all.
_BAND = 56
_BAND_O = 23
_DEV_MAX = 22.0


def _make_kernel(num_beams: int, kbins: int, wq: int):
    def kernel(scalars_ref, beams_ref, orig_ref, meta_ref, theta_ref,
               xi_ref, yi_ref, lut_ref, out_ref, col_ref, win_ref,
               win3_ref, sem):
        max_range = scalars_ref[0, 0]
        z_hit = scalars_ref[0, 1]
        z_short = scalars_ref[0, 2]
        z_rand = scalars_ref[0, 3]
        z_max = scalars_ref[0, 4]
        sigma_hit = scalars_ref[0, 5]
        lambda_short = scalars_ref[0, 6]
        beam_max_range = scalars_ref[0, 7]

        # ---- stage 1: per-block colranges via flattened-cell one-hot ----
        for idx, (start, size) in enumerate(_BLOCKS):
            # The LUT is stored x-major ([2*Wq, K, Hq]) so the window's x
            # extent rides the UNTILED leading dim: the x origin needs no
            # alignment, and each window x-row is a leading-index slice
            # with offset-free layout — the flatten into the 2-D matmul
            # operand is a plain store at a 128-aligned lane offset, no
            # sublane relayout.  The y origin must be provably 128-lane-
            # aligned: it arrives in 64-cell granules resolved against the
            # TWIN TABLE — the LUT stored twice along x, the second copy
            # y-shifted by 64 cells, so a 128-tall window at any
            # 64-granular y origin is a 128-aligned slice of one copy
            # (the trick of ops/pallas_reweight.py's per-beam windows).
            x0 = orig_ref[0, 0, idx]
            g = orig_ref[0, 1, idx]  # y origin granule (64 cells)
            ya = (g // 2) * 128  # aligned lane offset within the copy
            sel = g - (g // 2) * 2  # which copy (0: unshifted, 1: +64)
            y0 = g * 64  # absolute window origin (vector math only)
            cp = pltpu.make_async_copy(
                lut_ref.at[pl.ds(sel * wq + x0, _CWX), :, pl.ds(ya, _CWY)],
                win3_ref, sem,
            )
            cp.start()
            cp.wait()
            for i in range(_CWX):
                win_ref[:, pl.ds(i * _CWY, _CWY)] = win3_ref[i]
            win = win_ref[...]  # [K, CWX*CWY], x-major
            for c in range(size // _CHUNK):
                sl = slice(start + c * _CHUNK, start + (c + 1) * _CHUNK)
                xi = xi_ref[0, sl][None, :]
                yi = yi_ref[0, sl][None, :]
                covered = ((xi >= x0) & (xi < x0 + _CWX)
                           & (yi >= y0) & (yi < y0 + _CWY))
                flat = (xi - x0) * _CWY + (yi - y0)  # [1, chunk]
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (_CWX * _CWY, _CHUNK), 0
                )
                oh = (flat == iota).astype(jnp.bfloat16)
                col = jax.lax.dot(
                    win, oh, preferred_element_type=jnp.float32
                )  # [K, chunk]
                # out-of-window cells read "all casts miss"
                col_ref[pl.ds(0, kbins), sl] = jnp.where(
                    covered, col, max_range
                )

        # ---- stage 2: per-beam bin select + mixture ----------------------
        two_pi = jnp.float32(2.0 * jnp.pi)
        sqrt2 = jnp.sqrt(jnp.float32(2.0))
        n_const = 1.0 / (jnp.sqrt(2.0 * jnp.float32(jnp.pi)) * sigma_hit)

        def mixture(z, z_mean, bm, acc):
            # beam mixture, verbatim (models/sensor/beam_lut.py)
            eta_hit = 2.0 / (
                _erf((beam_max_range - z_mean) / (sqrt2 * sigma_hit))
                - _erf(-z_mean / (sqrt2 * sigma_hit))
            )
            d = (z - z_mean) / sigma_hit
            pz = z_hit * eta_hit * n_const * jnp.exp(-0.5 * d * d)
            eta_short = 1.0 / (1.0 - jnp.exp(-lambda_short * z_mean))
            pz = pz + jnp.where(
                z < z_mean,
                z_short * lambda_short * eta_short
                * jnp.exp(-lambda_short * z),
                0.0,
            )
            pz = pz + jnp.where(
                z < beam_max_range, z_rand / beam_max_range, z_max
            )
            # where, not multiply: masked beams may carry NaN points
            # (standard invalid-return encoding) and 0 * NaN = NaN
            return acc + jnp.where(bm > 0.0, pz * pz * pz, 0.0)

        def bins_of(theta, bearing):
            ft = jnp.mod(theta + bearing, two_pi) / two_pi * kbins
            fl = jnp.floor(ft)
            return fl.astype(jnp.int32) % kbins, ft - fl

        banded = kbins >= 2 * _BAND  # band + wrap margins must fit
        if banded:
            # wraparound extension: bands near bin K-1 read duplicated
            # rows [K, K+_BAND) so no per-particle modulo on row indices
            col_ref[kbins:kbins + _BAND, :] = col_ref[0:_BAND, :]

        # Per lane block: theta-sorted layouts give each block a narrow
        # world-bearing band, so the bin select runs over a _BAND-row
        # slice of col instead of all K rows (~K/_BAND x less VPU work +
        # traffic).  The XLA side gates each block on its measured theta
        # spread (meta row 1); wide blocks — strays pooled last, global
        # localization — take the exact full-K path.
        for idx, (start, size) in enumerate(_BLOCKS):
            bsl = pl.ds(start, size)
            theta_blk = theta_ref[0, bsl][None, :]

            def beam_full(b, acc, theta=theta_blk, sl=bsl, sz=size):
                z = beams_ref[0, 0, b]
                bearing = beams_ref[0, 1, b]
                bm = beams_ref[0, 2, b]
                k0, a = bins_of(theta, bearing)
                k1 = (k0 + 1) % kbins
                cols = col_ref[pl.ds(0, kbins), sl]
                iota_k = jax.lax.broadcasted_iota(jnp.int32, (kbins, sz), 0)
                r0 = jnp.sum(jnp.where(k0 == iota_k, cols, 0.0), axis=0,
                             keepdims=True)
                r1 = jnp.sum(jnp.where(k1 == iota_k, cols, 0.0), axis=0,
                             keepdims=True)
                return mixture(z, (1.0 - a) * r0 + a * r1, bm, acc)

            def run_full(sl=bsl, sz=size, fn=beam_full):
                out_ref[0, sl] = jax.lax.fori_loop(
                    0, num_beams, fn, jnp.zeros((1, sz), jnp.float32)
                )[0]

            if not banded:
                run_full()
                continue

            tmean = meta_ref[0, 0, idx]
            valid = meta_ref[0, 1, idx] > 0.0

            def beam_band(b, acc, theta=theta_blk, sl=bsl, sz=size,
                          tmean=tmean):
                z = beams_ref[0, 0, b]
                bearing = beams_ref[0, 1, b]
                bm = beams_ref[0, 2, b]
                k0, a = bins_of(theta, bearing)
                # band origin: floor-8 of (block-mean bin - o); margins
                # give |bin - mean bin| <= _DEV_MAX coverage (gated)
                fc = jnp.mod(tmean + bearing, two_pi) / two_pi * kbins
                kd = jnp.mod(jnp.floor(fc).astype(jnp.int32) - _BAND_O,
                             kbins) // 8
                band = col_ref[pl.ds(kd * 8, _BAND), sl]
                rel = k0 - kd * 8
                rel = jnp.where(rel < 0, rel + kbins, rel)
                iota_b = jax.lax.broadcasted_iota(jnp.int32, (_BAND, sz), 0)
                r0 = jnp.sum(jnp.where(rel == iota_b, band, 0.0), axis=0,
                             keepdims=True)
                r1 = jnp.sum(jnp.where(rel + 1 == iota_b, band, 0.0),
                             axis=0, keepdims=True)
                return mixture(z, (1.0 - a) * r0 + a * r1, bm, acc)

            @pl.when(valid)
            def _(sl=bsl, sz=size, fn=beam_band):
                out_ref[0, sl] = jax.lax.fori_loop(
                    0, num_beams, fn, jnp.zeros((1, sz), jnp.float32)
                )[0]

            @pl.when(jnp.logical_not(valid))
            def _():
                run_full()

    return kernel


def _beam_lut_call(lut_bf16, theta, xi, yi, valid, beams, max_range, mix,
                   interpret=False):
    """Core pallas call over ``F`` filters folded into the tile grid.

    theta/xi/yi: [F, Np] with Np a multiple of ``_TILE``; valid: bool
    [F, Np] marking real (non-pad) lanes; beams: [F, 3, B].
    """
    twq, kbins, hq = lut_bf16.shape
    wq = twq // 2  # twin table: two y-shifted copies along x
    f, n_pad = theta.shape
    nb = beams.shape[-1]
    tiles_pf = n_pad // _TILE
    n_tiles = f * tiles_pf
    n_blocks = len(_BLOCKS)

    flat = lambda v: v.reshape(1, -1)  # noqa: E731

    # Per-(tile, block) window origins from block mean cells.  Pad lanes
    # are EXCLUDED from every statistic: their value is an arbitrary slot
    # replica, and letting it vote would recenter the window on whatever
    # particle happened to be copied (e.g. the strays-last sort puts the
    # worst outlier in the final slot).  Their scores are sliced away by
    # the caller, so only the stats matter.
    vm = valid.astype(jnp.float32).reshape(n_tiles, _TILE)

    def bmean(v):
        vt = v.reshape(n_tiles, _TILE)
        return jnp.stack(
            [jnp.sum(vt[:, s:s + zz] * vm[:, s:s + zz], axis=1)
             / jnp.maximum(jnp.sum(vm[:, s:s + zz], axis=1), 1.0)
             for s, zz in _BLOCKS], axis=1
        )  # [n_tiles, n_blocks]

    cx = bmean(xi.astype(jnp.float32)).astype(jnp.int32)
    cy = bmean(yi.astype(jnp.float32)).astype(jnp.int32)
    # x origin in cells (untiled leading dim: no alignment); y origin in
    # 64-cell granules against the twin table (kernel rescales provably
    # 128-aligned)
    x0 = jnp.clip(cx - _CWX // 2, 0, wq - _CWX)
    y0 = jnp.clip((cy - _CWY // 2 + 32) // 64, 0, (hq - _CWY) // 64)
    gp = -(-(2 * n_blocks) // 128) * 128
    origins = jnp.zeros((n_tiles, 2, gp), jnp.int32)
    origins = origins.at[:, 0, :n_blocks].set(x0).at[:, 1, :n_blocks].set(y0)

    # per-(tile, block) circular theta mean + banded-path gate (stage 2)
    tht = theta.reshape(n_tiles, _TILE)
    tmeans, valids = [], []
    for s, zz in _BLOCKS:
        blk = tht[:, s : s + zz]
        m = vm[:, s : s + zz]
        tm = jnp.arctan2(jnp.sum(jnp.sin(blk) * m, axis=1),
                         jnp.sum(jnp.cos(blk) * m, axis=1) + 1e-20)
        dev = jnp.max(
            jnp.abs(jnp.mod(blk - tm[:, None] + jnp.pi, 2.0 * jnp.pi)
                    - jnp.pi) * m,
            axis=1,
        )
        tmeans.append(tm)
        valids.append(dev * kbins / (2.0 * jnp.pi) <= _DEV_MAX)
    metas = jnp.zeros((n_tiles, 2, gp), jnp.float32)
    metas = metas.at[:, 0, :n_blocks].set(jnp.stack(tmeans, axis=1))
    metas = metas.at[:, 1, :n_blocks].set(
        jnp.stack(valids, axis=1).astype(jnp.float32)
    )

    scalars = jnp.concatenate(
        [jnp.asarray([max_range], jnp.float32),
         jnp.asarray(mix, jnp.float32)]
    )[None, :]  # [1, 8]

    kernel = _make_kernel(nb, kbins, wq)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, nb), lambda i, tpf=tiles_pf: (i // tpf, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, gp), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2, gp), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, _TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, f * n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kbins + _BAND, _TILE), jnp.float32),
            pltpu.VMEM((kbins, _CWX * _CWY), jnp.bfloat16),
            pltpu.VMEM((_CWX, kbins, _CWY), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(scalars, beams, origins, metas, flat(theta.astype(jnp.float32)),
      flat(xi.astype(jnp.int32)), flat(yi.astype(jnp.int32)), lut_bf16)
    return out.reshape(f, n_pad)


from jax import custom_batching


@functools.partial(custom_batching.custom_vmap)
def beam_lut_windowed(
    lut_bf16: Array,
    theta: Array,
    xi: Array,
    yi: Array,
    z: Array,
    bearing: Array,
    beam_mask: Array,
    max_range,
    mix,
) -> Array:
    """Beam weights ``sum_b pz^3`` for one filter through windowed LUT
    lookups; vmaps over fleets by folding filters into the tile grid (the
    shared HBM-resident LUT stays unbatched).

    Args:
      lut_bf16: bf16[2*Wq, K, Hq] x-major twin-table range LUT (bearing
        bins on sublanes, y lanes) from :func:`build_lut_bf16`.
      theta: f32[N] particle headings (grid-local); xi/yi: i32[N] cells.
      z/bearing/beam_mask: f32[B]/f32[B]/bool[B] measured ranges+bearings.
    """
    return _windowed_impl(lut_bf16, theta[None], xi[None], yi[None],
                          z[None], bearing[None], beam_mask[None],
                          max_range, mix)[0]


def _windowed_impl(lut_bf16, theta, xi, yi, z, bearing, beam_mask,
                   max_range, mix, interpret=False):
    f, n = theta.shape
    n_pad = -(-n // _TILE) * _TILE

    def pad(v):
        # pad value is arbitrary (pad lanes are excluded from the window/
        # band statistics and their scores are sliced away below)
        return jnp.pad(v, ((0, 0), (0, n_pad - n)), mode="edge")

    valid = jnp.broadcast_to(jnp.arange(n_pad) < n, (f, n_pad))
    beams = jnp.stack(
        [z, bearing, beam_mask.astype(jnp.float32)], axis=1
    )  # [F, 3, B]
    out = _beam_lut_call(
        lut_bf16, pad(theta), pad(xi), pad(yi), valid, beams, max_range,
        mix, interpret=interpret,
    )
    return out[:, :n]


@beam_lut_windowed.def_vmap
def _beam_lut_windowed_vmap(axis_size, in_batched, lut_bf16, theta, xi, yi,
                            z, bearing, beam_mask, max_range, mix):
    lb, tb, xb, yb, zb, bb, mb, rb, xbm = in_batched
    # The LUT/params are logically shared across the fleet (one map).  They
    # can still ARRIVE batched: `lax.cond` batching instantiates closure
    # constants as broadcast-batched operands when the predicate is batched
    # (the filter-update gate under vmap).  Those are broadcasts of one
    # array — take slice 0.  Genuinely per-filter LUTs are unsupported.
    if lb:
        lut_bf16 = lut_bf16[0]
    if rb:
        max_range = max_range[0]
    if xbm:
        mix = mix[0]

    def bcast(v, batched):
        return v if batched else jnp.broadcast_to(v[None], (axis_size,) + v.shape)

    out = _windowed_impl(
        lut_bf16, bcast(theta, tb), bcast(xi, xb), bcast(yi, yb),
        bcast(z, zb), bcast(bearing, bb), bcast(beam_mask, mb),
        max_range, mix,
    )
    return out, True


def build_lut_bf16(ranges: Array) -> Array:
    """``f32[K, H, W]`` range LUT -> twin-table bf16 ``[2*Wq, K, Hq]``
    (x leading/untiled, bearing bins on sublanes, y lanes) for
    :func:`beam_lut_windowed`.

    x-major storage keeps the window's x extent on the untiled leading
    dim (arbitrary origins; offset-free row slices in the kernel).  The
    LUT is stored twice along x; the second copy is y-shifted by 64
    cells, so a 128-tall y window at any 64-granular origin is a
    128-lane-aligned slice of one of the copies — the only dynamic-slice
    shape Mosaic accepts for the window DMA's lane dim.  Padded dims are
    at least the window extent so the origin clip stays a valid interval
    on small maps (padding cells are never selected: real cell indices
    are < H, W)."""
    k, h, w = ranges.shape
    wq = max(w, _CWX)
    hq = max(-(-h // 128) * 128, _CWY)
    lt = jnp.pad(
        jnp.transpose(ranges, (2, 0, 1)).astype(jnp.bfloat16),
        ((0, wq - w), (0, 0), (0, hq - h)),
    )
    shifted = jnp.pad(lt[:, :, 64:], ((0, 0), (0, 0), (0, 64)))
    return jnp.concatenate([lt, shifted], axis=0)
