"""Pallas fused resample-and-gather kernel.

Resampling on TPU is inversion by CDF: positions ``u`` are located in the
cumulative weight distribution and the matching donor particle is copied.
The XLA path does this as a counting searchsorted (a fori_loop of
compare-reduces, ~1.8 ms at bench size) followed by a serialized random
gather of the donor states (~5 ms — random gathers run at ~5e7 rows/s on
v5e regardless of table size).  This kernel fuses both:

    interval mask:  m[k, q] = (u_q >= cdf[k-1]) & (u_q < cdf[k])
    donor copy:     out[:, q] = values_split [3D, N] @ m [N, C]

The mask IS the donor one-hot — one VPU compare pass yields both the
search result and the gather selector, and the copy itself rides the MXU.
State values are split into 3 bf16 planes (8+8+8 = 24 mantissa bits), so
the copied f32 states are bit-exact.

Semantics match ops/resample.py::_select: donor k satisfies
``cdf[k-1] <= u < cdf[k]`` (searchsorted side='right'), with the last
interval closed above so u >= cdf[-1] clips to the last slot.  Dead slots
carry zero weight -> zero-width intervals -> never selected.

The public entry is unbatched (one filter); fleets batch it with ``vmap``,
which lifts the pallas grid automatically.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_CHUNK = 512  # positions per inner step
# mega-size granules: at M >= 262144 fewer, bigger trips win (per-trip
# loop/slice overhead ~0.5 us dominates the [NBLK, C] compare mask);
# measured in-step at 1M: chunk 1024 / nblk 512 = 15.1 vs 15.8 ms/step
_CHUNK_MEGA = 1024
_NBLK_MEGA = 512
_MBLK = 8192  # positions per pallas program (the grid axis)
# particle-axis granule: each position chunk scans only the granule blocks
# spanning [min u, max u], so the [NBLK, C] interval mask covers ~chunk-many
# donors instead of all N.  SORTED positions (every production path:
# systematic, stratified, sorted-order-statistics multinomial) make the
# per-chunk span ~C + slack; 256 won the hardware sweep (fleet 64x4096:
# 1.68 -> 1.08 ms, mega 262k: 2.45 -> 0.96 ms floor-corrected; NOTES.md
# round 2) against per-trip loop/dot overhead (~0.2 us) on v5e.
_NBLK = 256
# value planes larger than this stay in HBM (kernel DMAs per-block slices).
# The scoped-VMEM budget for whole-array block specs is ~16 MiB on v5e;
# 48 MiB sat exactly at the boundary and compiled only for some enclosing
# programs (the r3 "2M-particle" blocker and an r4 ablation crash) — 12 MiB
# leaves room for the CDF tiles and the output block in every context.
_VMEM_VALS_LIMIT = 12 << 20


def trunc_bf16(x: Array) -> Array:
    """x with its f32 mantissa truncated to the bf16 grid, computed on the
    bit pattern.  The naive ``x - x.astype(bf16).astype(f32)`` residual is
    UNSAFE: under ``--xla_allow_excess_precision`` (set on some TPU
    runtimes) XLA elides the f32→bf16→f32 round-trip and the residual
    folds to zero — donor states silently quantize to bf16.  Bit masking
    cannot be elided."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )


def _split3(x: Array) -> Array:
    """f32[D, N] -> bf16[3D, N] hi/mid/lo planes (their sum is exact).

    Truncation (Dekker-style) split: each plane carries 8 consecutive
    significand bits, every plane is exactly bf16-representable, and each
    subtraction is exact, so hi + mid + lo == x bit-for-bit in f32."""
    hi = trunc_bf16(x)
    r = x - hi
    mid = trunc_bf16(r)
    lo = r - mid
    return jnp.concatenate([hi, mid, lo], axis=-2).astype(jnp.bfloat16)


def _sum3(picked: Array, d: int, rows_out: int) -> Array:
    """Sum the hi/mid/lo plane groups of ``picked`` [>=3d, C] into the
    [rows_out, C] output block (rows beyond d are padding zeros)."""
    s = picked[:d] + picked[d : 2 * d] + picked[2 * d : 3 * d]
    if rows_out > d:
        s = jnp.concatenate(
            [s, jnp.zeros((rows_out - d, picked.shape[1]), jnp.float32)]
        )
    return s


def _make_kernel_small(chunk: int, d: int):
    """Single-program kernel for small filters (n <= 2 * _NBLK): full
    interval mask per position chunk, static loop bounds (the dynamic
    block-range bookkeeping of the big-N kernel costs ~10% at fleet size).

    ``d`` is the true plane count: ``vals_ref`` holds the 3 bf16 split
    planes padded to an 8-row multiple (rows beyond 3d are zero)."""

    def _kernel(cdf_ref, cdf_prev_ref, u_ref, bounds_ref, vals_ref, out_ref):
        del bounds_ref
        m = u_ref.shape[1]

        cdf_col = cdf_ref[0, :][:, None]  # [N, 1]
        prev_col = cdf_prev_ref[0, :][:, None]
        vals = vals_ref[:]  # [3D, N]

        def body(c, _):
            u = u_ref[0, pl.ds(c * chunk, chunk)][None, :]  # [1, C]
            # no is_last clause: positions satisfy u < 1.0 = cdf[n-1]
            # strictly (see resample_take's contract), so the last real
            # interval is closed by construction and pad positions (1.5)
            # match nothing
            mask = (u >= prev_col) & (u < cdf_col)  # [N, C]
            picked = jnp.dot(
                vals, mask.astype(vals.dtype), preferred_element_type=jnp.float32
            )  # [3D, C]
            out_ref[:, pl.ds(c * chunk, chunk)] = _sum3(picked, d, out_ref.shape[0])
            return 0

        jax.lax.fori_loop(0, m // chunk, body, 0)

    return _kernel


def _make_kernel(chunk: int, nblk: int, d: int):
    """Kernel over padded arrays (the position contract u < 1.0 closes the
    last real CDF interval; padded CDF entries sit at 2.0)."""

    def _kernel(cdf_ref, cdf_prev_ref, u_ref, bounds_ref, vals_ref, out_ref):
        n = cdf_ref.shape[1]
        d3 = vals_ref.shape[0]
        m = u_ref.shape[1]
        n_blocks = n // nblk

        # block boundaries: cdf value at the end of each particle block
        # (computed by the caller); a position chunk only needs the blocks
        # spanning [min u, max u], so sorted positions (systematic/
        # stratified) cost O(N + M) blocks total instead of O(N * M / chunk)
        bounds = bounds_ref[0, :][None, :]

        def body(c, _):
            u = u_ref[0, pl.ds(c * chunk, chunk)][None, :]  # [1, C]
            u_min = jnp.min(u)
            u_max = jnp.max(u)
            lob = jnp.sum((bounds < u_min).astype(jnp.int32))
            hib = jnp.minimum(
                jnp.sum((bounds <= u_max).astype(jnp.int32)) + 1, n_blocks
            )

            def nblock(b, acc):
                # particle-axis blocking keeps the mask at [NBLK, C] so VMEM
                # stays bounded for any N (262k+ particles spill otherwise);
                # offsets marked provably lane-aligned (Mosaic emits a slow
                # unaligned-slice path otherwise — docs/kernels.md)
                off = pl.multiple_of(b * nblk, nblk)
                cdf_b = cdf_ref[0, pl.ds(off, nblk)][:, None]
                prev_b = cdf_prev_ref[0, pl.ds(off, nblk)][:, None]
                # no is_last clause: u < 1.0 = cdf[n_real-1] strictly
                mask = (u >= prev_b) & (u < cdf_b)  # [NBLK, C]
                vals_b = vals_ref[:, pl.ds(off, nblk)]
                return acc + jnp.dot(
                    vals_b, mask.astype(vals_b.dtype),
                    preferred_element_type=jnp.float32,
                )

            picked = jax.lax.fori_loop(
                lob, hib, nblock, jnp.zeros((d3, chunk), jnp.float32)
            )  # [3D, C]
            out_ref[:, pl.ds(c * chunk, chunk)] = _sum3(picked, d, out_ref.shape[0])
            return 0

        jax.lax.fori_loop(0, m // chunk, body, 0)

    return _kernel


# particle blocks per DMA granule (huge path).  span=4 was measured
# SLOWER in-step at 2M (10.0 vs 8.4 ms/step): each granule pays 4x the
# [NBLK, C] compare work, which outweighs the 2.5x trip reduction — the
# loop is compare-, not DMA-latency-, bound.  The span machinery stays
# (correct for any span via per-block predicates) with span=1.
_HUGE_SPAN = 1
# double-buffer the huge path's per-block DMAs (issue block b+1's copies
# before computing block b) so transfer latency overlaps the mask+dot
_HUGE_PIPELINE = True


def _make_kernel_huge_pipelined(chunk: int, nblk: int, d: int):
    """Huge path with 2-slot double buffering: block b+1's three copies
    (values + cdf + cdf_prev) are issued before block b's compute, hiding
    per-trip DMA latency behind the [NBLK, C] mask + dot.  Slot = b % 2;
    every reached iteration b waits exactly the copies issued for b (by
    the prologue or iteration b-1), so starts and waits stay matched for
    any dynamic [lob, hib) range."""

    def _kernel(cdf_ref, cdf_prev_ref, u_ref, bounds_ref, vals_ref, out_ref,
                vblk_ref, cblk_ref, pblk_ref, sem, csem, psem):
        d3 = vblk_ref.shape[1]
        m = u_ref.shape[1]
        n_blocks = cdf_ref.shape[0]
        bounds = bounds_ref[0, :][None, :]

        def start(b, slot):
            pltpu.make_async_copy(
                cdf_ref.at[pl.ds(b, 1)], cblk_ref.at[slot], csem.at[slot]
            ).start()
            pltpu.make_async_copy(
                cdf_prev_ref.at[pl.ds(b, 1)], pblk_ref.at[slot],
                psem.at[slot],
            ).start()
            pltpu.make_async_copy(
                vals_ref.at[:, pl.ds(pl.multiple_of(b * nblk, nblk), nblk)],
                vblk_ref.at[slot], sem.at[slot],
            ).start()

        def wait(b, slot):
            pltpu.make_async_copy(
                cdf_ref.at[pl.ds(b, 1)], cblk_ref.at[slot], csem.at[slot]
            ).wait()
            pltpu.make_async_copy(
                cdf_prev_ref.at[pl.ds(b, 1)], pblk_ref.at[slot],
                psem.at[slot],
            ).wait()
            pltpu.make_async_copy(
                vals_ref.at[:, pl.ds(pl.multiple_of(b * nblk, nblk), nblk)],
                vblk_ref.at[slot], sem.at[slot],
            ).wait()

        def body(c, _):
            u = u_ref[0, pl.ds(c * chunk, chunk)][None, :]  # [1, C]
            u_min = jnp.min(u)
            u_max = jnp.max(u)
            lob = jnp.sum((bounds < u_min).astype(jnp.int32))
            hib = jnp.minimum(
                jnp.sum((bounds <= u_max).astype(jnp.int32)) + 1, n_blocks
            )
            start(lob, jax.lax.rem(lob, 2))  # prologue ([lob, hib) nonempty)

            def nblock(b, acc):
                slot = jax.lax.rem(b, 2)
                nxt = b + 1

                @pl.when(nxt < hib)
                def _():
                    start(nxt, jax.lax.rem(nxt, 2))

                wait(b, slot)
                cdf_b = cblk_ref[slot, 0, 0, :][:, None]
                prev_b = pblk_ref[slot, 0, 0, :][:, None]
                # no is_last clause: u < 1.0 = cdf[n_real-1] strictly
                mask = (u >= prev_b) & (u < cdf_b)  # [NBLK, C]
                vals_b = vblk_ref[slot]
                return acc + jnp.dot(
                    vals_b, mask.astype(vals_b.dtype),
                    preferred_element_type=jnp.float32,
                )

            picked = jax.lax.fori_loop(
                lob, hib, nblock, jnp.zeros((d3, chunk), jnp.float32)
            )  # [3D, C]
            out_ref[:, pl.ds(c * chunk, chunk)] = _sum3(picked, d, out_ref.shape[0])
            return 0

        jax.lax.fori_loop(0, m // chunk, body, 0)

    return _kernel


def _make_kernel_huge(chunk: int, nblk: int, d: int):
    """Like :func:`_make_kernel`, but the value planes AND the CDF arrays
    stay in HBM, with the touched particle blocks DMA'd into VMEM
    scratch: beyond ~2M particles even the two ``f32[N]`` CDF arrays blow
    the scoped-VMEM budget (16 MiB at N = 2M), and the ``[3D, N]`` bf16
    table does so far earlier.  The CDF arrays arrive reshaped
    ``[n_blocks, 1, nblk]`` so a block is a LEADING-dim slice — tiled
    memref DMA slices need tile-multiple extents, and only the leading
    dims of a >=3-D memref are untiled (docs/kernels.md field notes).

    DMA granule = ``_HUGE_SPAN`` consecutive blocks per copy (r5): the
    r4 one-block-per-trip loop paid ~1.2 us of serialized DMA latency
    per trip (~5k trips at 2M = ~6 ms per fire — latency-, not
    bandwidth-, bound).  Sorted positions make each chunk's donor span
    ~chunk/nblk + 1 consecutive blocks, so one 4-block copy covers a
    whole chunk in the common case; a dynamic granule loop with
    per-block predicates keeps arbitrary weight concentration correct
    (a granule whose clamped window re-covers earlier blocks masks them
    out)."""

    span = _HUGE_SPAN

    def _kernel(cdf_ref, cdf_prev_ref, u_ref, bounds_ref, vals_ref, out_ref,
                vblk_ref, cblk_ref, pblk_ref, sem, csem, psem):
        d3 = vblk_ref.shape[0]
        m = u_ref.shape[1]
        n_blocks = cdf_ref.shape[0]
        bounds = bounds_ref[0, :][None, :]

        def body(c, _):
            u = u_ref[0, pl.ds(c * chunk, chunk)][None, :]  # [1, C]
            u_min = jnp.min(u)
            u_max = jnp.max(u)
            lob = jnp.sum((bounds < u_min).astype(jnp.int32))
            hib = jnp.minimum(
                jnp.sum((bounds <= u_max).astype(jnp.int32)) + 1, n_blocks
            )
            n_gran = (hib - lob + span - 1) // span

            def granule(gi, acc):
                # clamped window start: the DMA always reads span blocks
                # in-bounds (n_pad is a span*nblk multiple); the per-block
                # predicate masks out blocks outside this granule's
                # intended range [lob + gi*span, min(lob+(gi+1)*span, hib))
                g0 = jnp.minimum(lob + gi * span, n_blocks - span)
                cc = pltpu.make_async_copy(
                    cdf_ref.at[pl.ds(g0, span)], cblk_ref, csem
                )
                pc = pltpu.make_async_copy(
                    cdf_prev_ref.at[pl.ds(g0, span)], pblk_ref, psem
                )
                vc = pltpu.make_async_copy(
                    vals_ref.at[
                        :, pl.ds(pl.multiple_of(g0 * nblk, nblk), span * nblk)
                    ],
                    vblk_ref, sem,
                )
                cc.start()
                pc.start()
                vc.start()
                cc.wait()
                pc.wait()
                vc.wait()
                lo_b = lob + gi * span
                for j in range(span):  # static sub-blocks, VMEM-resident
                    b_abs = g0 + j
                    keep = (b_abs >= lo_b) & (b_abs < hib)
                    cdf_b = cblk_ref[j, 0, :][:, None]
                    prev_b = pblk_ref[j, 0, :][:, None]
                    # no is_last clause: u < 1.0 = cdf[n_real-1] strictly
                    mask = keep & (u >= prev_b) & (u < cdf_b)  # [NBLK, C]
                    vals_b = vblk_ref[:, pl.ds(j * nblk, nblk)]
                    acc = acc + jnp.dot(
                        vals_b, mask.astype(vals_b.dtype),
                        preferred_element_type=jnp.float32,
                    )
                return acc

            picked = jax.lax.fori_loop(
                0, n_gran, granule, jnp.zeros((d3, chunk), jnp.float32)
            )  # [3D, C]
            out_ref[:, pl.ds(c * chunk, chunk)] = _sum3(picked, d, out_ref.shape[0])
            return 0

        jax.lax.fori_loop(0, m // chunk, body, 0)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "chunk", "nblk")
)
def resample_take(
    weights: Array,
    positions: Array,
    values: Array,
    interpret: bool = False,
    chunk: int | None = None,
    nblk: int | None = None,
) -> Array:
    """Fused CDF search + donor copy for one filter.

    Args:
      weights: f32[N] linear weights (zero on dead slots).
      positions: f32[M] resampling positions in [0, 1) — STRICTLY below
        1.0 (all POSITIONERS guarantee this; sorted order statistics are
        clamped to 1 - 2^-24).  The kernel relies on it: the last real
        CDF interval is closed by u < 1.0 = cdf[n-1] rather than an
        explicit last-slot clause.
      values: f32[D, N] per-particle state planes.
      chunk / nblk: position-chunk and donor-granule sizes (static; lane-
        aligned multiples of 128).
    Returns:
      f32[M, D] donor states (bit-exact copies).
    """
    n = weights.shape[0]
    m = positions.shape[0]
    d = values.shape[0]
    if chunk is None:
        chunk = _CHUNK_MEGA if m >= 262144 else _CHUNK
    if nblk is None:
        nblk = _NBLK_MEGA if m >= 262144 else _NBLK
    m_pad = -(-m // chunk) * chunk
    if m_pad != m:
        # padded positions never select a donor (cdf pads at 2.0, u pads at
        # 1.5) and their zero rows are sliced off below
        positions = jnp.pad(positions, (0, m_pad - m), constant_values=1.5)

    c = jnp.cumsum(weights.astype(jnp.float32))
    cdf = c / jnp.maximum(c[-1], 1e-38)
    # XLA's parallel prefix sum reassociates, so the f32 CDF can dip by
    # ~1 ulp at scan-block boundaries.  The interval mask needs a monotone
    # CDF or a position in a dip matches two intervals (the donor SUM is
    # garbage) or none (donor 0); cummax flattens dips into zero-width
    # intervals, guaranteeing exactly one match.
    cdf = jax.lax.cummax(cdf)
    cdf_prev = jnp.pad(cdf[:-1], (1, 0))

    # pad the particle axis to the kernel's block size; padded CDF entries
    # sit at 2.0 so no position (u < 1.5) ever selects them.  The huge
    # path's clamped fixed-span DMA windows additionally need n_pad to be
    # a span*nblk multiple (decided below on the un-span-padded size —
    # span padding never flips a huge table back under the VMEM limit)
    huge_probe = (
        (-(-(3 * d) // 8) * 8) * (-(-n // nblk) * nblk)
        * (4 if interpret else 2)
        > _VMEM_VALS_LIMIT
    )
    blk_unit = nblk * (_HUGE_SPAN if huge_probe else 1)
    n_pad = -(-n // blk_unit) * blk_unit
    cdf = jnp.pad(cdf, (0, n_pad - n), constant_values=2.0)
    cdf_prev = jnp.pad(cdf_prev, (0, n_pad - n), constant_values=2.0)

    # pad the SPLIT planes (not the input planes) to the 8-row sublane
    # multiple: a d=4 SE2 state packs to 12 split planes padded to 16
    # rather than 8 -> 24 — one third less copy work and VMEM footprint
    d_pad = -(-d // 8) * 8
    d3_pad = -(-(3 * d) // 8) * 8
    vals3 = _split3(jnp.pad(values, ((0, 0), (0, n_pad - n))))  # [3D, N']
    vals3 = jnp.pad(vals3, ((0, d3_pad - 3 * d), (0, 0)))
    if interpret:  # CPU has no bf16 matmul: keep planes, compute in f32
        vals3 = vals3.astype(jnp.float32)

    # grid over position blocks: bounds VMEM to the CDF/value planes plus
    # one [d_pad, mblk] output tile (262k-particle filters fit in ~15 MB);
    # small filters keep a single block so no position is padded twice
    mblk = min(_MBLK, m_pad)
    mg = -(-m_pad // mblk) * mblk
    if mg != m_pad:
        positions = jnp.pad(positions, (0, mg - m_pad), constant_values=1.5)
    n_blocks = n_pad // nblk
    bounds = cdf.reshape(n_blocks, nblk)[:, -1]
    small = n_pad <= 2 * nblk
    # beyond ~2M particles the whole [3D, N] value table exceeds VMEM —
    # keep it in HBM and let the kernel DMA per-block slices
    huge = huge_probe  # probe used the un-span-padded size: when it is
    # False, blk_unit == nblk and the sizes coincide; when True, span
    # padding only grows the table further past the limit
    if small:
        kernel = _make_kernel_small(chunk, d)
    elif huge and _HUGE_PIPELINE and _HUGE_SPAN == 1:
        kernel = _make_kernel_huge_pipelined(chunk, nblk, d)
    elif huge:
        kernel = _make_kernel_huge(chunk, nblk, d)
    else:
        kernel = _make_kernel(chunk, nblk, d)
    pipelined = huge and _HUGE_PIPELINE and _HUGE_SPAN == 1
    if pipelined:
        cdf_in = cdf.reshape(n_blocks, 1, nblk)
        prev_in = cdf_prev.reshape(n_blocks, 1, nblk)
        cdf_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((2, d3_pad, nblk), vals3.dtype),
            pltpu.VMEM((2, 1, 1, nblk), jnp.float32),
            pltpu.VMEM((2, 1, 1, nblk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    elif huge:
        cdf_in = cdf.reshape(n_blocks, 1, nblk)
        prev_in = cdf_prev.reshape(n_blocks, 1, nblk)
        cdf_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((d3_pad, _HUGE_SPAN * nblk), vals3.dtype),
            pltpu.VMEM((_HUGE_SPAN, 1, nblk), jnp.float32),
            pltpu.VMEM((_HUGE_SPAN, 1, nblk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
    else:
        cdf_in = cdf[None, :]
        prev_in = cdf_prev[None, :]
        cdf_spec = pl.BlockSpec(
            (1, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        scratch = []
    out = pl.pallas_call(
        kernel,
        grid=(mg // mblk,),
        in_specs=[
            cdf_spec,
            cdf_spec,
            pl.BlockSpec((1, mblk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_blocks), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY) if huge else pl.BlockSpec(
                (d3_pad, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (d_pad, mblk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d_pad, mg), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(cdf_in, prev_in, positions[None, :], bounds[None, :], vals3)
    return out[:d, :m].T


def pack_state(states: Any) -> tuple[Array, Any, list]:
    """Flatten a state pytree (leaves [N] or [N, k]) into f32[D, N] planes."""
    leaves, treedef = jax.tree_util.tree_flatten(states)
    n = leaves[0].shape[0]
    planes = [jnp.reshape(l, (n, -1)).T.astype(jnp.float32) for l in leaves]
    shapes = [l.shape for l in leaves]
    return jnp.concatenate(planes, axis=0), treedef, shapes


def unpack_state(packed: Array, treedef, shapes) -> Any:
    """Inverse of :func:`pack_state` for ``packed`` f32[M, D]."""
    m = packed.shape[0]
    leaves, at = [], 0
    for shape in shapes:
        k = 1
        for s in shape[1:]:
            k *= s
        leaves.append(packed[:, at : at + k].reshape((m,) + shape[1:]))
        at += k
    return jax.tree_util.tree_unflatten(treedef, leaves)


def resample_take_tree(
    weights: Array, positions: Array, states: Any, interpret: bool = False
) -> Any:
    """Fused resample+copy over an arbitrary state pytree (one filter)."""
    packed, treedef, shapes = pack_state(states)
    out = resample_take(weights, positions, packed, interpret=interpret)
    return unpack_state(out, treedef, shapes)


def resample_take_tree_multinomial(
    key: Array, weights: Array, states: Any, num: int, interpret: bool = False,
    interleave: bool = True,
) -> Any:
    """Exact-multiset multinomial resample for large filters.

    Draws sorted uniform order statistics (exponential spacings — the
    donor interval counts are exactly multinomial), runs the block-local
    fused kernel, and interleaves the slot order with a transpose so slot
    prefixes cover the CDF uniformly.  ~25x the iid-position kernel at
    262k particles; the only deviation from iid draw order is the
    deterministic interleave (documented in NOTES.md).

    ``interleave=False`` keeps the donors in CDF (input-index) order —
    used by ``sorted_slots`` filters, where input order is a theta sort
    and the output must preserve it (valid only when the KLD prefix
    semantics are inactive, i.e. fixed particle counts: a sorted prefix
    would be a biased subsample).
    """
    from beluga_tpu.ops.resample import interleave_slots, sorted_multinomial_positions

    u = sorted_multinomial_positions(key, num)
    packed, treedef, shapes = pack_state(states)
    out = resample_take(weights, u, packed, interpret=interpret)
    if interleave:
        out = interleave_slots(out)
    return unpack_state(out, treedef, shapes)
