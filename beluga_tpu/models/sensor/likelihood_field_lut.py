"""Shared-scan likelihood LUT: the reweight as a per-θ correlation map.

For a *fixed* scan, the likelihood-field weight is a function of the pose
only:

    w(t, θ) = 1 + Σ_b LF³(t + R(θ) p_b)

For each of K discretized headings the sum over beams is a correlation of
``LF³`` with the rotated scan footprint — an image that can be precomputed
once per scan with B shifted accumulations, after which every particle
costs **one (θ-interpolated: two) table lookup instead of B lookups**.

This is the designed fast path for workloads where many filters (or many
particles) evaluate the *same* scan — Monte Carlo evaluation fleets,
per-scan multi-hypothesis scoring — where the O(K·B·H·W) build amortizes
over millions of particle evaluations (NOTES.md round-2 plan).

Approximations vs the exact model (both bounded and tested):
  * heading quantized to K bins with linear interpolation between bins;
  * beam endpoints sampled bilinearly instead of floor-cell;
  * out-of-map beams contribute ``unknown_prob³`` exactly, implemented by
    evaluating on a field padded with ``unknown_prob`` by the scan radius
    (the reference reads unknown_prob for any miss, so inside the padded
    envelope this is not an approximation).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.lie import SE2
from beluga_tpu.models.sensor.likelihood_field import LikelihoodField

Array = jax.Array


def _dc(cls, meta=()):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls) if f.name not in meta]
    return jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=list(meta)
    )


@(lambda c: _dc(c, meta=("pad_cells", "n_theta")))
class ScanLut:
    """Per-scan correlation maps ``values[K, Hp, Wp]`` (pz³ sums)."""

    values: Array
    resolution: Array
    world_to_field: SE2
    pad_cells: int
    n_theta: int


def _pad_field_cubed(
    field: LikelihoodField,
    max_point_radius: float,
    resolution_hint: float,
    align: tuple[int, int] = (1, 1),
):
    """(padded pz³ image, pad_cells): core field surrounded by an
    unknown³ band at least the scan radius wide; dims rounded up to
    ``align`` multiples (the extra fill extends the band on the high side).
    """
    lf3 = field.values**3
    unknown3 = (jnp.zeros((), jnp.float32) + field.unknown_prob) ** 3
    pad = int(np.ceil(max_point_radius / resolution_hint)) + 2
    h, w = lf3.shape
    ha, wa = align
    hp = -(-(h + 2 * pad) // ha) * ha
    wp = -(-(w + 2 * pad) // wa) * wa
    padded = jnp.pad(lf3, ((pad, hp - h - pad), (pad, wp - w - pad)))
    # fill the pad band with unknown^3 (pad constant_values can't be traced)
    yy = jnp.arange(hp)[:, None]
    xx = jnp.arange(wp)[None, :]
    in_core = (yy >= pad) & (yy < pad + h) & (xx >= pad) & (xx < pad + w)
    return jnp.where(in_core, padded, unknown3), pad


def _radius_or_default(points: Array, max_point_radius: float | None) -> float:
    if max_point_radius is None:
        return float(
            np.ceil(np.linalg.norm(np.asarray(points), axis=-1).max() + 0.5)
        )
    return max_point_radius


def build_scan_lut(
    field: LikelihoodField,
    points: Array,
    beam_mask: Array,
    n_theta: int = 128,
    max_point_radius: float | None = None,
    resolution_hint: float | None = None,
) -> ScanLut:
    """Precompute the K per-heading correlation maps for one scan.

    ``max_point_radius`` bounds the scan footprint (defaults to the max
    beam endpoint norm, rounded up — requires concrete ``points``; pass it
    explicitly under jit) and sets the padding band; shifts wrap through
    the uniform unknown-padding so `jnp.roll` is safe.  ``resolution_hint``
    must be given under jit (the pad width is static).
    """
    max_point_radius = _radius_or_default(points, max_point_radius)
    if resolution_hint is None:
        resolution_hint = float(jax.device_get(field.resolution))

    res = field.resolution
    padded, pad = _pad_field_cubed(field, max_point_radius, resolution_hint)

    thetas = jnp.arange(n_theta, dtype=jnp.float32) * (2.0 * jnp.pi / n_theta)

    def one_theta(theta):
        c, s = jnp.cos(theta), jnp.sin(theta)
        # beam offsets in cell units (fractional)
        ox = (c * points[:, 0] - s * points[:, 1]) / res
        oy = (s * points[:, 0] + c * points[:, 1]) / res

        def add_beam(b, acc):
            # bilinear sample of the shifted image: LUT(c) += LF3(c + off_b)
            fx, fy = ox[b], oy[b]
            ix = jnp.floor(fx).astype(jnp.int32)
            iy = jnp.floor(fy).astype(jnp.int32)
            ax, ay = fx - ix, fy - iy
            # shift image content by -offset: value at cell c comes from c+off
            def sh(dy, dx):
                return jnp.roll(padded, shift=(-(iy + dy), -(ix + dx)), axis=(0, 1))

            sample = (
                (1 - ax) * (1 - ay) * sh(0, 0)
                + ax * (1 - ay) * sh(0, 1)
                + (1 - ax) * ay * sh(1, 0)
                + ax * ay * sh(1, 1)
            )
            return acc + jnp.where(beam_mask[b], sample, 0.0)

        return jax.lax.fori_loop(
            0, points.shape[0], add_beam, jnp.zeros_like(padded)
        )

    values = jax.lax.map(one_theta, thetas)
    return ScanLut(
        values=values,
        resolution=res,
        world_to_field=field.world_to_field,
        pad_cells=pad,
        n_theta=n_theta,
    )


def build_scan_lut_pallas(
    field: LikelihoodField,
    points: Array,
    beam_mask: Array,
    n_theta: int = 128,
    max_point_radius: float | None = None,
    resolution_hint: float | None = None,
    sampling: str = "bilinear",
    downsample: int = 1,
    interpret: bool | None = None,
) -> ScanLut:
    """`build_scan_lut` computed by the VMEM-resident Pallas kernel
    (ops/pallas_scan_lut.py): identical bilinear samples (beam sum
    reassociated), ~30× less HBM traffic than the XLA roll build.

    The kernel is VPU-shuffle-bound, so two speed/accuracy knobs trade
    sampling fidelity (both stay below or near the LUT's inherent
    heading-quantization error for typical ``n_theta``):
      * ``sampling="nearest"`` — ≤ half-cell sampling error, ~1.5× faster;
      * ``downsample=d`` — build the LUT on a d-strided field (cell size
        d·res, build cost 1/d²).

    Padded dims are rounded up to (8, 128) multiples; the extra fill
    extends the unknown band (pad_cells is unchanged, lookups clip the
    same way).
    """
    from beluga_tpu.ops.pallas_scan_lut import scan_lut_correlate

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    max_point_radius = _radius_or_default(points, max_point_radius)
    if resolution_hint is None:
        resolution_hint = float(jax.device_get(field.resolution))

    if downsample > 1:
        # decimated field view: cell (i, j) keeps its world position, so
        # world_to_field and the cell-corner convention are unchanged
        field = dataclasses.replace(
            field,
            values=field.values[::downsample, ::downsample],
            resolution=field.resolution * downsample,
        )
        resolution_hint = resolution_hint * downsample

    padded, pad = _pad_field_cubed(
        field, max_point_radius, resolution_hint, align=(8, 128)
    )
    values = scan_lut_correlate(
        padded, points, beam_mask, field.resolution, n_theta,
        sampling=sampling, interpret=interpret,
    )
    return ScanLut(
        values=values,
        resolution=field.resolution,
        world_to_field=field.world_to_field,
        pad_cells=pad,
        n_theta=n_theta,
    )


def build_scan_lut_fft(
    field: LikelihoodField,
    points: Array,
    beam_mask: Array,
    n_theta: int = 128,
    max_point_radius: float = 4.0,
    resolution_hint: float | None = None,
) -> ScanLut:
    """FFT build of the correlation maps: one forward FFT of the padded
    ``LF³`` plus K closed-form footprint spectra and K inverse FFTs.

    The K sparse beam footprints never materialize — their spectra are sums
    of complex exponentials ``Σ_b exp(-2πi(u·off_b))``.  Roughly an order
    of magnitude cheaper than the shift-accumulate build; sampling is
    periodic-sinc (vs bilinear), which can ring slightly near sharp field
    edges — accuracy tested against the exact model.
    """
    if resolution_hint is None:
        resolution_hint = float(jax.device_get(field.resolution))

    res = field.resolution
    padded, pad = _pad_field_cubed(field, max_point_radius, resolution_hint)
    hp, wp = padded.shape

    spectrum = jnp.fft.rfft2(padded)  # [hp, wp//2+1]

    thetas = jnp.arange(n_theta, dtype=jnp.float32) * (2.0 * jnp.pi / n_theta)
    fy = jnp.fft.fftfreq(hp)[:, None]  # rows (y axis)
    fx = jnp.fft.rfftfreq(wp)[None, :]  # cols (x axis)

    def one_theta(theta):
        c, s = jnp.cos(theta), jnp.sin(theta)
        ox = (c * points[:, 0] - s * points[:, 1]) / res  # cells, x
        oy = (s * points[:, 0] + c * points[:, 1]) / res  # cells, y
        # value at cell q of the correlation = sum_b padded(q + off_b):
        # spectrum multiplier exp(+2πi (fy*oy + fx*ox)) per beam
        phase = 2.0 * jnp.pi * (
            fy[None, :, :] * oy[:, None, None] + fx[None, :, :] * ox[:, None, None]
        )  # [B, hp, wf]
        footprint = jnp.sum(
            jnp.where(
                beam_mask[:, None, None],
                jnp.exp(1j * phase.astype(jnp.float32)),
                0.0,
            ),
            axis=0,
        )
        return jnp.fft.irfft2(spectrum * footprint, s=(hp, wp)).astype(jnp.float32)

    values = jax.lax.map(one_theta, thetas)
    return ScanLut(
        values=values,
        resolution=res,
        world_to_field=field.world_to_field,
        pad_cells=pad,
        n_theta=n_theta,
    )


def scan_lut_weights(lut: ScanLut, states: SE2, lookup_mode: str = "auto") -> Array:
    """AMCL-parity weights ``1 + Σ pz³`` from the LUT; ``f32[N]``.

    One θ-interpolated lookup per particle (two table reads), vs B beam
    lookups for the direct model.
    """
    from beluga_tpu.ops.gather2d import table_lookup

    tf = lut.world_to_field @ states
    k, hp, wp = lut.values.shape

    xi = jnp.floor(tf.x / lut.resolution).astype(jnp.int32) + lut.pad_cells
    yi = jnp.floor(tf.y / lut.resolution).astype(jnp.int32) + lut.pad_cells
    xi = jnp.clip(xi, 0, wp - 1)
    yi = jnp.clip(yi, 0, hp - 1)

    theta = jnp.mod(tf.theta, 2.0 * jnp.pi)
    ft = theta / (2.0 * jnp.pi) * k
    k0 = jnp.floor(ft).astype(jnp.int32) % k
    k1 = (k0 + 1) % k
    a = ft - jnp.floor(ft)

    flat = lut.values.reshape(k * hp, wp)
    v0 = table_lookup(flat, k0 * hp + yi, xi, mode=lookup_mode)
    v1 = table_lookup(flat, k1 * hp + yi, xi, mode=lookup_mode)
    return 1.0 + (1.0 - a) * v0 + a * v1
