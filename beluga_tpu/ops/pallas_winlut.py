"""Pallas windowed pose-LUT lookup: one MXU lookup per particle.

Companion kernel to the *windowed* shared-scan LUT
(models/sensor/likelihood_field_winlut.py): the per-scan pose likelihood
``L(θ, y, x) = Σ_b pz³`` is precomputed over a small window of poses
covering the (converged) particle cloud, and this kernel evaluates every
particle with a θ-interpolated floor-cell lookup — the reweight drops from
B beam lookups per particle to ONE table read.

Serialized gathers run at ~5e7 rows/s on v5e regardless of table size
(NOTES.md), so the read rides the MXU instead, with the same one-hot
pattern as ops/pallas_reweight.py:

    rows[x, p]  = Σ_j  w_j(p) · (L_T[t_lo+j, x, :] @ tent_y)   (bf16 MXU)
    val[p]      = Σ_x (xi_p == x) · rows[x, p]                 (VPU select)

where ``tent_y[y, p] = relu(1 - |y_p - y|)`` is the slab-shared y
one-hot/lerp (built and converted once per tile) and the θ-lerp weight
``w_j = (1-a)·[k₀=j] + a·[k₀=j-1]`` scales the [Wx, p] dot OUTPUT at f32
— the two θ-neighbor reads cost one matmul series, not two, and the
per-slab VPU work is a [Wx, p] scale-accumulate instead of a [Wy, p]
one-hot build (4x less at Wy=128/Wx=32).

Each lane tile of ``tile`` particles reads its θ-slab base ``t_lo`` from
SMEM (precomputed per tile in XLA as the clamped floor of the tile's min
valid θ-bin); with θ-sorted particle slots (``sorted_slots``) a
``tblk``-deep slab covers the tile: per-particle MXU work is
``tblk · Wx · Wy`` MAC, so SMALL tiles with shallow slabs win — but a
slab that under-covers its tile's θ span silently scores the tile's
θ-extremes as miss, which CONTRACTS the θ posterior and random-walks the
estimate (measured: tblk=8 at 8 tiles drifted to 2 m where tblk=16
tracked at 0.1 m) — the default (512, 16) covers ≤0.69 rad per tile at
dth = 2π/128 and is drift-tested; shrink tblk only with the coverage
gate on.
Particles outside the window in x, y, or θ (stray tails, recovery
injections, tiles whose θ span exceeds the slab) score ``miss`` — the
all-beams-unknown weight, the same convention as the windowed beam kernel
(ops/pallas_beam_lut.py); callers gate the fast path on in-window
coverage and fall back to the exact per-beam model otherwise.

The LUT is stored x-major ``[K, Wx, Wy]`` so the dynamic θ-slab index
rides the untiled leading dim (docs/kernels.md field notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _make_kernel(k_bins: int, wx: int, wy: int, tblk: int,
                 dynamic_span: bool = False, int8_table: bool = False):
    def kernel(scal_ref, tlo_ref, xi_ref, yi_ref, t_ref, vals_ref, out_ref,
               acc_ref):
        miss = scal_ref[0, 0]
        base = scal_ref[0, 1]
        scale = scal_ref[0, 2]
        t_lo = tlo_ref[0, 0, 0]
        p = xi_ref.shape[1]

        # fractional window coordinates: the lookup is TRILINEAR (x, y, θ).
        # A floor-cell lookup makes the weight piecewise-constant over 1-cell
        # pose bins — the measurement then cannot pull the cloud sub-cell
        # and tracking error random-walks at the cell scale (measured: the
        # gate-free mega filter drifted 0.01 -> 1.2 m where the exact model
        # equilibrates at ~0.1 m).  The y-lerp rides the one-hot weights and
        # the x-lerp the select stage, so the MXU work is unchanged.
        xf = xi_ref[0, :][None, :]  # f32 [1, P]
        yf = yi_ref[0, :][None, :]
        t = t_ref[0, :][None, :]
        k0 = jnp.floor(t)
        k0rel = k0 - t_lo.astype(jnp.float32)
        u = t - t_lo.astype(jnp.float32)  # continuous θ-slab coordinate

        # Mosaic's tpu.iota is integer-only; cast for the f32 compares
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (wy, p), 0).astype(jnp.float32)
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (wx, p), 0).astype(jnp.float32)

        # all three lerps are tent kernels relu(1 - |coord - index|); the
        # y-tent is θ-slab-INDEPENDENT, so it is built once and each slab
        # pays one broadcast multiply (the old form rebuilt the bilinear
        # one-hot per slab: 2 compares + 2 selects + add over [Wy, P])
        tent_y = jnp.maximum(1.0 - jnp.abs(yf - iota_y), 0.0)

        # dynamic slab range (opt-in): the tile's slab span [0, span) is
        # computed in XLA (clamped floor of max valid t, +2 for the lerp
        # neighbor) — a θ-sorted tile touches only ~2-3 of its tblk slab
        # bins in steady state, so the dynamic fori does ~3 dots instead
        # of tblk.  Standalone this is ~2x faster, but INSIDE the fused
        # filter step it measures ~2x SLOWER (6.7 vs 3.0 ms/step in-step
        # at 1M: the static dot sequence overlaps the step's other DMA
        # traffic, the dynamic loop does not) — hence default False; see
        # NOTES.md r4.  Per-slab pl.when predication is worse still
        # (stalls the slab-load pipeline: 24.6 vs 16.9 ms/step e2e).
        span = tlo_ref[0, 0, 1]
        # θ-weight applied to the [Wx, P] dot OUTPUT, not the [Wy, P]
        # one-hot input: per-slab VPU work drops from a [Wy, P]
        # multiply+convert (the old ``ohy = wj * tent_y`` build) to a
        # [Wx, P] scale-accumulate (4x less at Wy=128/Wx=32), the shared
        # tent_y quantizes once, and wj multiplies at f32 instead of
        # being rounded into the one-hot (strictly more accurate —
        # notably the int8 path no longer quantizes the θ-lerp at all).
        tent_yq = (
            jnp.round(tent_y * 127.0).astype(jnp.int8)
            if int8_table else tent_y.astype(vals_ref.dtype)
        )
        acc_ref[...] = jnp.zeros((wx, p), jnp.float32)

        def slab_dot(j, carry):
            # θ-lerp tent: (1-a)·[k₀rel=j] + a·[k₀rel=j-1] == relu(1-|u-j|)
            wj = jnp.maximum(1.0 - jnp.abs(u - j.astype(jnp.float32)), 0.0)
            slab = vals_ref[pl.ds(t_lo + j, 1)][0]  # [Wx, Wy]
            if int8_table:
                # int8 x int8 -> int32 rides the MXU at 2x the bf16 rate;
                # the y-tent quantizes to 1/127 (<= 0.4% of full scale —
                # below the bf16 table's own mantissa granularity).  The
                # combined table+one-hot scale (scale / 127) is applied
                # once after the x-select.
                acc_ref[...] += wj * jax.lax.dot(
                    slab, tent_yq, preferred_element_type=jnp.int32
                ).astype(jnp.float32)
            else:
                acc_ref[...] += wj * jax.lax.dot(
                    slab, tent_yq, preferred_element_type=jnp.float32
                )
            return carry

        if dynamic_span:
            jax.lax.fori_loop(0, span, slab_dot, 0)
        else:
            for j in range(tblk):  # static unroll: tblk dots per tile
                slab_dot(jnp.int32(j), 0)
        wx_sel = jnp.maximum(1.0 - jnp.abs(xf - iota_x), 0.0)
        acc = acc_ref[...]
        if int8_table:
            acc = acc * (scale * (1.0 / 127.0))
        val = jnp.sum(wx_sel * acc, axis=0, keepdims=True)

        valid = (
            (xf >= 0.0) & (xf <= wx - 1.0) & (yf >= 0.0) & (yf <= wy - 1.0)
            & (k0rel >= 0.0) & (k0rel <= tblk - 2)
        )
        out_ref[:] = jnp.where(valid, base + val, miss)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tile", "tblk", "interpret", "dynamic_span")
)
def winlut_lookup(
    values_t: Array,
    xi: Array,
    yi: Array,
    t: Array,
    miss: Array,
    base: Array | float = 1.0,
    tile: int = 512,
    tblk: int = 16,
    interpret: bool = False,
    dynamic_span: bool = False,
    scale: Array | float = 1.0,
) -> Array:
    """Evaluate ``base + lerp_θ(L[t, yi, xi])`` per particle; ``f32[N]``.

    Args:
      values_t: ``bf16[K, Wx, Wy]`` x-major windowed LUT — or
        ``int8[K, Wx, Wy]`` quantized values (real value = entry ·
        ``scale``), which run the lookup dots at the MXU's 2x int8 rate.
      xi, yi: f32[N] FRACTIONAL window-cell coordinates (pre-offset by
        the window origin; bilinear in x/y, out-of-range ⇒ miss).
      t: f32[N] fractional θ-bin coordinate (k₀ = floor(t) and k₀+1 are
        lerped; out-of-range ⇒ miss).  Slots should be θ-sorted so each
        ``tile`` spans ≤ ``tblk - 1`` bins; particles above their tile's
        slab score miss (they fail the coverage gate upstream).
      miss: scalar replacement weight for out-of-window particles.
      base: additive base (1.0 for the ``1 + Σpz³`` AMCL parity weight).
      tile: particles per kernel program (lane-axis block).
      tblk: θ-slab depth per tile (k₀ and k₀+1 must both fit).
    Returns f32[N] weights.
    """
    k_bins, wx, wy = values_t.shape
    tblk = min(tblk, k_bins)
    n = xi.shape[0]
    n_pad = -(-n // tile) * tile

    def pad(v):
        return jnp.pad(
            v.astype(jnp.float32), (0, n_pad - n), constant_values=-1.0
        )[None, :]

    xi_p, yi_p, t_p = pad(xi), pad(yi), pad(t)

    # per-tile θ-slab base: clamped floor of the tile's min valid t (strays
    # carry t outside [0, K) and score miss regardless of the slab); the
    # slab SPAN is the clamped number of bins up to the tile's max valid t
    # (+2 for the lerp neighbor) — the kernel's dynamic fori runs only
    # that many dots
    n_tiles = n_pad // tile
    t_tiles = t_p.reshape(n_tiles, tile)
    in_rng = (t_tiles >= 0.0) & (t_tiles < k_bins)
    t_in = jnp.where(in_rng, t_tiles, jnp.inf)
    t_lo = jnp.clip(
        jnp.floor(jnp.min(t_in, axis=1)), 0.0, max(k_bins - tblk, 0)
    ).astype(jnp.int32)
    t_hi = jnp.floor(jnp.max(jnp.where(in_rng, t_tiles, -jnp.inf), axis=1))
    # all-stray tiles: max over an empty valid set is -inf, whose int32
    # conversion is implementation-defined and whose subtraction wraps —
    # select span 0 explicitly (their particles score miss regardless)
    any_valid = jnp.any(in_rng, axis=1)
    span = jnp.where(
        any_valid,
        jnp.clip(
            jnp.where(any_valid, t_hi, 0.0).astype(jnp.int32) - t_lo + 2,
            0, tblk,
        ),
        0,
    )
    # [n_tiles, 1, 8]: per-tile SMEM scalars need last-two block dims equal
    # to the array dims (Mosaic block-shape rule; cf. ops/pallas_beam_lut.py)
    t_lo = jnp.pad(
        jnp.stack([t_lo, span], axis=-1)[:, None, :],
        ((0, 0), (0, 0), (0, 6)),
    )

    scal = jnp.stack(
        [
            jnp.asarray(miss, jnp.float32),
            jnp.asarray(base, jnp.float32),
            jnp.asarray(scale, jnp.float32),
        ]
    )[None, :]

    int8_table = values_t.dtype == jnp.int8
    vals = values_t
    if interpret and not int8_table:
        # CPU has no bf16 matmul path worth testing; use f32
        vals = values_t.astype(jnp.float32)

    out = pl.pallas_call(
        _make_kernel(k_bins, wx, wy, tblk, dynamic_span, int8_table),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (k_bins, wx, wy), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wx, tile), jnp.float32)],
        interpret=interpret,
    )(scal, t_lo, xi_p, yi_p, t_p, vals)
    return out[0, :n]
