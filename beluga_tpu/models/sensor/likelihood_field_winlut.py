"""Windowed shared-scan pose-likelihood LUT (the mega-filter tracking path).

The shared-scan LUT (likelihood_field_lut.py) turns the per-beam reweight
into one table read per particle, but builds the correlation over the
WHOLE map × K headings — O(K·B·H·W) per scan — and then reads it through
serialized gathers (~5e7 rows/s on v5e).  For a *converged* cloud both
costs are waste: the posterior occupies a ~2 m × 2 m × 2 rad box.  This
module builds the LUT only over a ``win × win``-cell window of poses
around the cloud, for ``k_bins`` heading bins centered on the cloud's mean
heading, and evaluates particles through the MXU one-hot kernel
(ops/pallas_winlut.py) — no gathers anywhere.

**Build = windowed DFT correlation.**  For heading θ the map is

    L_θ(q) = Σ_b pz³_field(q + R(θ)·p_b / res)

a correlation of the (padded) pz³ image with the scan footprint.  The
footprint never materializes: its spectrum is a sum of B complex
exponentials, separable per beam, so the whole build is a short complex
einsum chain on the MXU

    S = Fy · region · Fxᵀ                       (one DFT of the region)
    G[k] = Σ_b wy[k,b] ⊗ wx[k,b]                (footprint spectra)
    L[k] = Re( IFy · (S ⊙ G[k]) · IFxᵀ )        (windowed inverse DFT)

with the inverse restricted to the ``win`` output rows/cols — ~5e9 MAC
for the default 64 × 128 × 128 window, vs ~3e10 VPU shuffle element-ops
for the roll-based full-map build.  ``jnp.fft`` is NOT used: irfft is
unimplemented on some TPU runtimes, and explicit DFT matmuls let XLA keep
everything on the MXU.  Sampling is periodic-sinc (exact fractional
shifts) rather than bilinear; the region extends a full scan-radius ring
beyond the window, so no wraparound alias reaches the window and the
ringing error on the smooth pz³ field is small (tested against the exact
model).

Approximations vs the exact LikelihoodFieldModel (likelihood_field_model
.hpp:68-91), all bounded and tested:
  * pose xy quantized to the cell grid (floor, like the full-map LUT);
  * heading quantized to ``dth`` bins with linear interpolation;
  * beam endpoints sinc-sampled instead of floor-cell;
  * out-of-window particles (stray tails, recovery injections) score the
    all-beams-unknown weight ``1 + Σ_b unknown³`` — callers gate on
    in-window coverage and fall back to the exact model below threshold.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.lie import SE2
from beluga_tpu.models.sensor.likelihood_field import LikelihoodField
from beluga_tpu.models.sensor.likelihood_field_lut import _pad_field_cubed

Array = jax.Array


def _dc(cls, meta=()):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls) if f.name not in meta]
    return jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=list(meta)
    )


def _win_xy(win) -> tuple[int, int]:
    """Normalize the window spec: an int is square, a pair is
    ``(win_x, win_y)``.  ``win_y`` is the kernel's lane/contraction dim
    (keep it a 128-multiple); ``win_x`` only needs 8-alignment, so a
    rectangular ``(64, 128)`` window halves the lookup MXU work."""
    if isinstance(win, (tuple, list)):
        wx, wy = int(win[0]), int(win[1])
        return wx, wy
    return int(win), int(win)


@(lambda c: _dc(c, meta=("pad_cells", "k_bins", "win_x", "win_y", "dth")))
class WindowedScanLut:
    """Windowed per-scan pose-likelihood maps.

    ``values_t``: x-major ``bf16[k_bins, win_x, win_y]`` pz³ sums;
    ``x0/y0``: dynamic window origin in padded-field cells; ``theta0``:
    heading of bin 0 (bin j covers theta0 + j·dth); ``miss``: the
    all-beams-unknown weight for out-of-window particles.
    """

    values_t: Array
    x0: Array
    y0: Array
    theta0: Array
    miss: Array
    resolution: Array
    world_to_field: SE2
    pad_cells: int
    k_bins: int
    win_x: int
    win_y: int
    dth: float
    # quantization scale for int8 tables (real value = entry · scale);
    # None/1.0 for bf16 tables
    scale: Array | None = None


def _grow_padded(padded: Array, pad: int, field: LikelihoodField,
                 win_x: int, win_y: int) -> Array:
    """Maps smaller than the window: grow the pad band (fill = unknown³)."""
    hr = win_y + 2 * pad
    wr = win_x + 2 * pad
    hp, wp = padded.shape
    unknown3 = (jnp.zeros((), jnp.float32) + field.unknown_prob) ** 3
    if hp < hr:
        padded = jnp.concatenate(
            [padded, jnp.full((hr - hp, wp), unknown3, jnp.float32)], axis=0
        )
        hp = hr
    if wp < wr:
        padded = jnp.concatenate(
            [padded, jnp.full((hp, wr - wp), unknown3, jnp.float32)], axis=1
        )
    return padded


def precompute_padded_field(
    field: LikelihoodField,
    win,
    max_point_radius: float = 4.0,
    resolution_hint: float | None = None,
) -> Array:
    """Map-static padded pz³ image for :func:`build_windowed_scan_lut` —
    compute once per map and pass as ``padded_cubed`` so the per-scan
    build skips the cube + pad of the full field."""
    if resolution_hint is None:
        resolution_hint = float(jax.device_get(field.resolution))
    win_x, win_y = _win_xy(win)
    padded, pad = _pad_field_cubed(field, max_point_radius, resolution_hint)
    return _grow_padded(padded, pad, field, win_x, win_y)


def window_geometry(
    field: LikelihoodField,
    center_x: Array,
    center_y: Array,
    center_theta: Array,
    k_bins: int = 64,
    win: int = 128,
    dth: float = 2.0 * np.pi / 128.0,
    max_point_radius: float = 4.0,
    resolution_hint: float | None = None,
):
    """Window origin ``(x0, y0, theta0, pad)`` for a cloud center — the
    cheap part of :func:`build_windowed_scan_lut` (no correlation build),
    so callers can gate on :func:`windowed_coverage` *before* paying for
    the values (e.g. the exact-fallback ``lax.cond`` in
    filters/builders.py make_windowed_scan_filter)."""
    if resolution_hint is None:
        resolution_hint = float(jax.device_get(field.resolution))
    win_x, win_y = _win_xy(win)
    res = field.resolution
    pad = int(np.ceil(max_point_radius / resolution_hint)) + 2
    h, w = field.values.shape
    hp = max(h + 2 * pad, win_y + 2 * pad)
    wp = max(w + 2 * pad, win_x + 2 * pad)
    tf_center = field.world_to_field @ SE2.from_xytheta(
        center_x, center_y, center_theta
    )
    cx = jnp.floor(tf_center.x / res).astype(jnp.int32) + pad
    cy = jnp.floor(tf_center.y / res).astype(jnp.int32) + pad
    # clamped so the scan-radius ring around the window stays inside the
    # padded image
    x0 = jnp.clip(cx - win_x // 2, pad, wp - win_x - pad)
    y0 = jnp.clip(cy - win_y // 2, pad, hp - win_y - pad)
    # θ grid anchored ABSOLUTELY (quantized to dth), like the cell-quantized
    # xy origin — a grid anchored to the cloud mean gives the mean-θ
    # particles exact bin values while off-mean particles pay the lerp
    # underestimate, a self-reinforcing pull toward the filter's own mean
    # that random-walks the estimate (measured: gate-free mega drift to
    # ~1.2 m where the exact model equilibrates at 0.1 m)
    theta0 = (jnp.floor(tf_center.theta / dth) - (k_bins // 2)) * dth
    return x0, y0, theta0, pad


def build_windowed_scan_lut(
    field: LikelihoodField,
    points: Array,
    beam_mask: Array,
    center_x: Array,
    center_y: Array,
    center_theta: Array,
    k_bins: int = 64,
    win: int = 128,
    dth: float = 2.0 * np.pi / 128.0,
    max_point_radius: float = 4.0,
    resolution_hint: float | None = None,
    table_dtype: str = "bf16",
    padded_cubed: Array | None = None,
) -> WindowedScanLut:
    """Build the windowed LUT for one scan around a cloud center.

    ``center_*`` are in world coordinates (traced scalars — typically the
    propagated cloud's mean).  ``resolution_hint`` must be given under jit.

    ``table_dtype``: ``"bf16"`` (default) or ``"int8"`` — int8 stores
    ``round(values / scale)`` with a per-build scale and runs the lookup
    at the MXU's 2x int8 rate (quantization error <= scale/2 ≈ 0.4% of
    the table max, the same order as bf16 mantissa granularity).

    ``padded_cubed``: optional map-static padded pz³ image from
    :func:`precompute_padded_field` — re-cubing and re-padding the field
    per scan costs ~0.27 ms/step at mega scale on v5e.
    """
    if resolution_hint is None:
        resolution_hint = float(jax.device_get(field.resolution))

    win_x, win_y = _win_xy(win)
    res = field.resolution
    if padded_cubed is not None:
        padded = padded_cubed
        pad = int(np.ceil(max_point_radius / resolution_hint)) + 2
    else:
        padded = _grow_padded(
            *_pad_field_cubed(field, max_point_radius, resolution_hint),
            field, win_x, win_y,
        )
        pad = int(np.ceil(max_point_radius / resolution_hint)) + 2
    hr = win_y + 2 * pad
    wr = win_x + 2 * pad
    hp, wp = padded.shape
    unknown3 = (jnp.zeros((), jnp.float32) + field.unknown_prob) ** 3

    x0, y0, theta0, _ = window_geometry(
        field, center_x, center_y, center_theta,
        k_bins=k_bins, win=win, dth=dth,
        max_point_radius=max_point_radius, resolution_hint=resolution_hint,
    )

    region = jax.lax.dynamic_slice(padded, (y0 - pad, x0 - pad), (hr, wr))

    # ---- explicit DFT correlation (all matmuls; no jnp.fft on TPU) ----
    ii = jnp.arange(hr, dtype=jnp.float32)
    jj = jnp.arange(wr, dtype=jnp.float32)
    fy_mat = jnp.exp(-2j * jnp.pi * ii[:, None] * ii[None, :] / hr)
    fx_mat = jnp.exp(-2j * jnp.pi * jj[:, None] * jj[None, :] / wr)
    hh_y = jnp.arange(win_y, dtype=jnp.float32) + pad
    hh_x = jnp.arange(win_x, dtype=jnp.float32) + pad
    ify = jnp.exp(2j * jnp.pi * hh_y[:, None] * ii[None, :] / hr) / hr
    ifx = jnp.exp(2j * jnp.pi * hh_x[:, None] * jj[None, :] / wr) / wr
    spectrum = fy_mat @ region.astype(jnp.complex64) @ fx_mat.T  # [HR, WR]

    th = theta0 + jnp.arange(k_bins, dtype=jnp.float32) * dth
    c, s = jnp.cos(th)[:, None], jnp.sin(th)[:, None]
    ox = (c * points[None, :, 0] - s * points[None, :, 1]) / res  # [K, B]
    oy = (s * points[None, :, 0] + c * points[None, :, 1]) / res
    fy = jnp.where(ii < hr // 2, ii, ii - hr) / hr
    fx = jnp.where(jj < wr // 2, jj, jj - wr) / wr
    # value at cell q is Σ_b region(q + off_b): multiplier exp(+2πi f·off)
    wy = jnp.exp(2j * jnp.pi * fy[None, None, :] * oy[:, :, None])  # [K,B,HR]
    wx = jnp.exp(2j * jnp.pi * fx[None, None, :] * ox[:, :, None])  # [K,B,WR]
    wy = wy * beam_mask[None, :, None]
    footprint = jnp.einsum("kbh,kbw->khw", wy, wx)  # [K, HR, WR]
    t1 = jnp.einsum("khw,xw->khx", spectrum[None] * footprint, ifx)
    values = jnp.einsum("yh,khx->kyx", ify, t1).real  # [K, win_y, win_x]

    miss = 1.0 + jnp.sum(jnp.where(beam_mask, unknown3, 0.0))
    values_t = values.transpose(0, 2, 1)
    if table_dtype == "int8":
        scale = jnp.maximum(jnp.max(values_t), 1e-6) / 127.0
        values_t = jnp.clip(
            jnp.round(values_t / scale), -128, 127
        ).astype(jnp.int8)
    else:
        scale = None
        values_t = values_t.astype(jnp.bfloat16)
    return WindowedScanLut(
        values_t=values_t,
        scale=scale,
        x0=x0,
        y0=y0,
        theta0=theta0,
        miss=miss,
        resolution=res,
        world_to_field=field.world_to_field,
        pad_cells=pad,
        k_bins=k_bins,
        win_x=win_x,
        win_y=win_y,
        dth=dth,
    )


def _coords(world_to_field, resolution, pad, x0, y0, theta0, k_bins, dth, states):
    tf = world_to_field @ states
    # fractional coordinates for the TRILINEAR kernel lookup; the -0.5
    # aligns the sinc-built samples (point samples at integer cell index)
    # with the exact model's floor-cell convention: floor(z) is the
    # zero-mean reconstruction of the smooth field at z - 0.5
    xi = tf.x / resolution - 0.5 + (pad - x0)
    yi = tf.y / resolution - 0.5 + (pad - y0)
    center = theta0 + (k_bins // 2) * dth
    rel = jnp.mod(tf.theta - center + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    t = rel / dth + (k_bins // 2)
    return xi, yi, t


def windowed_coords(lut: WindowedScanLut, states: SE2):
    """Per-particle fractional (xi, yi, t) window coordinates as f32
    (strays fall outside [0, win-1] / [0, k_bins))."""
    return _coords(
        lut.world_to_field, lut.resolution, lut.pad_cells, lut.x0, lut.y0,
        lut.theta0, lut.k_bins, lut.dth, states,
    )


def windowed_coverage_from_center(
    field: LikelihoodField,
    states: SE2,
    center_x: Array,
    center_y: Array,
    center_theta: Array,
    k_bins: int = 64,
    win: int = 128,
    dth: float = 2.0 * np.pi / 128.0,
    max_point_radius: float = 4.0,
    resolution_hint: float | None = None,
    stride: int = 8,
) -> Array:
    """Coverage fraction for a window that *would* be built around
    ``center_*`` — no correlation build, so a fallback gate can run before
    paying for :func:`build_windowed_scan_lut`."""
    win_x, win_y = _win_xy(win)
    x0, y0, theta0, pad = window_geometry(
        field, center_x, center_y, center_theta, k_bins=k_bins, win=win,
        dth=dth, max_point_radius=max_point_radius,
        resolution_hint=resolution_hint,
    )
    xi, yi, t = _coords(
        field.world_to_field, field.resolution, pad, x0, y0, theta0,
        k_bins, dth, states,
    )
    xi, yi, t = xi[::stride], yi[::stride], t[::stride]
    ok = (
        (xi >= 0) & (xi <= win_x - 1) & (yi >= 0) & (yi <= win_y - 1)
        & (t >= 0) & (jnp.floor(t) <= k_bins - 2)
    )
    return jnp.mean(ok.astype(jnp.float32))


def coverage_tiled_from_coords(
    xi: Array, yi: Array, t: Array,
    k_bins: int, win, tile: int, tblk: int,
) -> Array:
    """Fraction of particles the winlut kernel would actually score —
    including the per-tile θ-slab: ops/pallas_winlut.py gives each
    ``tile``-lane block a slab of ``tblk`` θ bins based at the clamped
    floor of the block's min valid t, and particles above the slab score
    miss.  This mirrors that validity bit-for-bit, so the fast-path gate
    trips the exact fallback whenever the slot ordering (sorted_slots) or
    the cloud's θ spread violates the kernel's contract — an unsorted or
    over-spread cloud can no longer pass the gate and silently score miss
    (advisor finding r2).
    """
    win_x, win_y = _win_xy(win)
    tblk = min(tblk, k_bins)  # mirror winlut_lookup's clamp
    n = xi.shape[0]
    n_pad = -(-n // tile) * tile

    def pad(v):
        return jnp.pad(v, (0, n_pad - n), constant_values=-1.0)

    xi_p, yi_p, t_p = pad(xi), pad(yi), pad(t)
    tt = t_p.reshape(-1, tile)
    t_in = jnp.where((tt >= 0.0) & (tt < k_bins), tt, jnp.inf)
    t_lo = jnp.clip(
        jnp.floor(jnp.min(t_in, axis=1)), 0.0, max(k_bins - tblk, 0)
    )
    k0rel = jnp.floor(tt) - t_lo[:, None]
    ok = (
        ((xi_p >= 0) & (xi_p <= win_x - 1) & (yi_p >= 0)
         & (yi_p <= win_y - 1)).reshape(-1, tile)
        & (k0rel >= 0.0)
        & (k0rel <= tblk - 2)
    )
    return jnp.sum(ok.astype(jnp.float32)) / n


def windowed_coverage_tiled_from_center(
    field: LikelihoodField,
    states: SE2,
    center_x: Array,
    center_y: Array,
    center_theta: Array,
    tile: int = 512,
    tblk: int = 16,
    k_bins: int = 64,
    win: int = 128,
    dth: float = 2.0 * np.pi / 128.0,
    max_point_radius: float = 4.0,
    resolution_hint: float | None = None,
) -> Array:
    """Kernel-exact coverage (incl. the θ-slab) for a window that *would*
    be built around ``center_*`` — the production fast-path gate."""
    x0, y0, theta0, pad = window_geometry(
        field, center_x, center_y, center_theta, k_bins=k_bins, win=win,
        dth=dth, max_point_radius=max_point_radius,
        resolution_hint=resolution_hint,
    )
    xi, yi, t = _coords(
        field.world_to_field, field.resolution, pad, x0, y0, theta0,
        k_bins, dth, states,
    )
    return coverage_tiled_from_coords(xi, yi, t, k_bins, win, tile, tblk)


def windowed_coverage(lut: WindowedScanLut, states: SE2, stride: int = 8) -> Array:
    """Fraction of (subsampled) particles the window covers — the fast-path
    gate (below threshold the caller falls back to the exact model)."""
    xi, yi, t = windowed_coords(lut, states)
    xi, yi, t = xi[::stride], yi[::stride], t[::stride]
    ok = (
        (xi >= 0) & (xi <= lut.win_x - 1) & (yi >= 0) & (yi <= lut.win_y - 1)
        & (t >= 0) & (jnp.floor(t) <= lut.k_bins - 2)
    )
    return jnp.mean(ok.astype(jnp.float32))


def windowed_scan_lut_weights(
    lut: WindowedScanLut,
    states: SE2,
    tile: int = 512,
    tblk: int = 16,
    interpret: bool | None = None,
) -> Array:
    """AMCL-parity weights ``1 + Σ_b pz³`` from the windowed LUT; f32[N].

    One θ-lerped MXU lookup per particle (ops/pallas_winlut.py); strays
    score ``lut.miss``.  Slots should be θ-sorted (``sorted_slots``) so
    each ``tile`` of particles spans at most ``tblk - 1`` θ bins.
    """
    from beluga_tpu.ops.pallas_winlut import winlut_lookup

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    xi, yi, t = windowed_coords(lut, states)
    return winlut_lookup(
        lut.values_t, xi, yi, t, lut.miss, base=1.0,
        tile=tile, tblk=tblk, interpret=interpret,
        scale=1.0 if lut.scale is None else lut.scale,
    )
