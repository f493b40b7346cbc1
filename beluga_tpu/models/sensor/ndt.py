"""NDT (Normal Distributions Transform) sensor model, 2D and 3D.

TPU re-design of ``sensor/ndt_sensor_model.hpp``: the measurement point
cloud is clustered into per-voxel Gaussians on device (``to_cells``,
hpp:86-111 — ≥5 points per cell, minimum variance 1e-5, truncation-based
voxel assignment ``(p / resolution).cast<int>()``), then each particle's
weight is ``1.0 + Σ_cells max(Σ_kernel d1·exp(-d2/2·eᵀ(Σa+Σb)⁻¹e),
min_likelihood)`` evaluated against the sparse map with a 3×3 (2D) or
7-cell (3D) neighbor kernel (hpp:112-147, 218-239).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.lie import SE2, SE3
from beluga_tpu.maps.ndt import NdtMap

Array = jax.Array

MIN_VARIANCE = 1e-5  # fit_points kMinVariance (ndt_sensor_model.hpp:67)
MIN_POINTS_PER_CELL = 5  # to_cells kMinPointsPerCell (hpp:90)

KERNEL_2D = np.array(
    [[-1, -1], [-1, 0], [-1, 1], [0, -1], [0, 0], [0, 1], [1, -1], [1, 0], [1, 1]],
    np.int32,
)  # hpp:113-123
KERNEL_3D = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 0, -1], [0, 1, 0], [0, -1, 0], [-1, 0, 0], [1, 0, 0]],
    np.int32,
)  # hpp:126-136


@dataclasses.dataclass(frozen=True)
class NdtModelParams:
    """(ndt_sensor_model.hpp:152-164)."""

    minimum_likelihood: float = 0.0
    d1: float = 1.0
    d2: float = 1.0


def fit_measurement_cells(points: Array, point_mask: Array, resolution: Array):
    """Cluster measurement points into per-voxel Gaussians on device.

    Port of ``to_cells`` + ``fit_points`` (hpp:64-111).  Returns
    ``(means f32[C, D], covs f32[C, D, D], cell_mask bool[C])`` with
    ``C = num_points`` capacity (cells with < 5 points are masked out).

    Voxel assignment uses the reference's truncation semantics
    (``(p / resolution).cast<int>()``), not floor.
    """
    from beluga_tpu.maps.ndt import encode_cells

    n, d = points.shape
    voxel = jnp.trunc(points / resolution).astype(jnp.int32)
    key = jnp.where(point_mask, encode_cells(voxel), jnp.uint32(0xFFFFFFFF))
    uniq, inv = jnp.unique(key, return_inverse=True, size=n, fill_value=jnp.uint32(0xFFFFFFFF))
    valid_cell = uniq != jnp.uint32(0xFFFFFFFF)

    w = point_mask.astype(jnp.float32)
    count = jax.ops.segment_sum(w, inv, num_segments=n)
    safe = jnp.maximum(count, 1.0)
    mean = jax.ops.segment_sum(w[:, None] * points, inv, num_segments=n) / safe[:, None]
    centered = points - mean[inv]
    outer = centered[:, :, None] * centered[:, None, :] * w[:, None, None]
    # sample covariance (divides by n-1, hpp:72-74)
    cov = jax.ops.segment_sum(outer, inv, num_segments=n) / jnp.maximum(
        count - 1.0, 1.0
    )[:, None, None]
    eye = jnp.eye(d, dtype=jnp.float32)
    diag_clamped = jnp.maximum(
        jnp.diagonal(cov, axis1=-2, axis2=-1), MIN_VARIANCE
    )
    cov = cov * (1.0 - eye) + diag_clamped[..., None] * eye

    cell_mask = valid_cell & (count >= MIN_POINTS_PER_CELL)
    return mean, cov, cell_mask


def _inv_2x2(m: Array) -> Array:
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    return jnp.stack(
        [
            jnp.stack([d, -b], -1),
            jnp.stack([-c, a], -1),
        ],
        -2,
    ) * inv_det[..., None, None]


def _inv_3x3(m: Array) -> Array:
    det = jnp.linalg.det(m)
    adj = jnp.linalg.inv(
        m + 1e-12 * jnp.eye(3, dtype=m.dtype)
    )  # small jitter for numerical safety
    del det
    return adj


# map tables at most this many rows take the dense cross-evaluation: with
# few cells, testing EVERY (query, map cell) pair beats per-offset key
# probes (no lookup at all, pure fused elementwise XLA) — reference-class
# NDT maps have tens to hundreds of cells
_DENSE_MAX_CELLS = 256


def _kernel_likelihood(ndt_map: NdtMap, params, meas_mean, meas_cov, kernel):
    """Σ over kernel offsets of d1·exp(-d2/2 eᵀ(Σa+Σb)⁻¹e) per query Gaussian.

    meas_mean: ``f32[..., D]``; meas_cov: ``f32[..., D, D]``.
    """
    d = meas_mean.shape[-1]
    # the dense path hardcodes the standard stencils — only dispatch to
    # it when the caller's kernel IS that stencil
    standard = np.array_equal(
        np.asarray(kernel), KERNEL_2D if d == 2 else KERNEL_3D
    )
    if standard and ndt_map.keys.shape[0] <= _DENSE_MAX_CELLS:
        return _kernel_likelihood_dense(ndt_map, params, meas_mean, meas_cov)
    center = ndt_map.cell_near(meas_mean)  # [..., D]
    cells = center[..., None, :] + jnp.asarray(kernel)  # [..., K, D]
    map_mean, map_cov, found = ndt_map.lookup_gaussians(cells)  # [..., K, ...]

    err = meas_mean[..., None, :] - map_mean  # [..., K, D]
    total_cov = meas_cov[..., None, :, :] + map_cov
    inv = _inv_2x2(total_cov) if d == 2 else _inv_3x3(total_cov)
    quad = jnp.einsum("...i,...ij,...j->...", err, inv, err)
    lik = params.d1 * jnp.exp((-params.d2 / 2.0) * quad)
    return jnp.sum(jnp.where(found, lik, 0.0), axis=-1)


def _kernel_likelihood_dense(ndt_map: NdtMap, params, meas_mean, meas_cov):
    """Small-map form: evaluate every (query, map cell) pair and mask by
    the stencil — cell_j contributes iff it lies in the query's kernel
    neighborhood (2D: the full 3x3, |Δ|∞ <= 1; 3D: center + 6 faces,
    |Δ|₁ <= 1 — exactly KERNEL_2D/KERNEL_3D).  Same per-pair math as the
    probe path with exact f32 map values."""
    from beluga_tpu.maps.ndt import _BIAS2, _BIAS3, _BITS3

    d = meas_mean.shape[-1]
    keys = ndt_map.keys
    mp = keys.shape[0]
    live = jnp.arange(mp) < ndt_map.num_cells
    if d == 2:
        cx = (keys >> 16).astype(jnp.int32) - _BIAS2
        cy = (keys & jnp.uint32(0xFFFF)).astype(jnp.int32) - _BIAS2
        cells = jnp.stack([cx, cy], -1)  # [M, 2]
    else:
        m = jnp.uint32((1 << _BITS3) - 1)
        cells = jnp.stack(
            [((keys >> (2 * _BITS3)) & m).astype(jnp.int32) - _BIAS3,
             ((keys >> _BITS3) & m).astype(jnp.int32) - _BIAS3,
             (keys & m).astype(jnp.int32) - _BIAS3], -1)  # [M, 3]
    qcell = ndt_map.cell_near(meas_mean)  # [..., D]
    delta = jnp.abs(qcell[..., None, :] - cells)  # [..., M, D]
    if d == 2:
        within = jnp.max(delta, axis=-1) <= 1
    else:
        within = jnp.sum(delta, axis=-1) <= 1
    within = within & live

    if d == 2:
        # scalarized symmetric 2x2 algebra: trailing [2, 2] tensor dims
        # lay out on 2-lane vregs (2/128 utilization) — component arrays
        # keep everything on [..., M] shapes.  Same det guard as _inv_2x2.
        ex = meas_mean[..., 0, None] - ndt_map.means[:, 0]  # [..., M]
        ey = meas_mean[..., 1, None] - ndt_map.means[:, 1]
        txx = meas_cov[..., 0, 0, None] + ndt_map.covs[:, 0, 0]
        txy = meas_cov[..., 0, 1, None] + ndt_map.covs[:, 0, 1]
        tyy = meas_cov[..., 1, 1, None] + ndt_map.covs[:, 1, 1]
        det = txx * tyy - txy * txy
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        quad = (ex * ex * tyy - 2.0 * ex * ey * txy + ey * ey * txx) / det
    else:
        # symmetric 3x3 closed form (adjugate), same layout rationale.
        # The diagonal jitter mirrors _inv_3x3 (the probe path): rank-
        # deficient NDT cells (planar/linear features) summed with a
        # measurement covariance degenerate in the same direction give a
        # SINGULAR total — the bare adjugate would collapse quad to ~0
        # (max likelihood for arbitrarily wrong particles), and a
        # slightly-negative rounding det would flip exp()'s sign.
        ex = meas_mean[..., 0, None] - ndt_map.means[:, 0]
        ey = meas_mean[..., 1, None] - ndt_map.means[:, 1]
        ez = meas_mean[..., 2, None] - ndt_map.means[:, 2]
        xx = meas_cov[..., 0, 0, None] + ndt_map.covs[:, 0, 0] + 1e-12
        xy = meas_cov[..., 0, 1, None] + ndt_map.covs[:, 0, 1]
        xz = meas_cov[..., 0, 2, None] + ndt_map.covs[:, 0, 2]
        yy = meas_cov[..., 1, 1, None] + ndt_map.covs[:, 1, 1] + 1e-12
        yz = meas_cov[..., 1, 2, None] + ndt_map.covs[:, 1, 2]
        zz = meas_cov[..., 2, 2, None] + ndt_map.covs[:, 2, 2] + 1e-12
        c00 = yy * zz - yz * yz
        c01 = xz * yz - xy * zz
        c02 = xy * yz - xz * yy
        c11 = xx * zz - xz * xz
        c12 = xy * xz - xx * yz
        c22 = xx * yy - xy * xy
        det = xx * c00 + xy * c01 + xz * c02
        # PSD + jitter: det > 0; the floor only guards f32 underflow
        det = jnp.maximum(det, 1e-30)
        quad = (ex * ex * c00 + ey * ey * c11 + ez * ez * c22
                + 2.0 * (ex * ey * c01 + ex * ez * c02 + ey * ez * c12)) / det
        quad = jnp.maximum(quad, 0.0)
    lik = params.d1 * jnp.exp((-params.d2 / 2.0) * quad)
    return jnp.sum(jnp.where(within, lik, 0.0), axis=-1)


def _chunked_over_particles(states, n, particle_chunk, body):
    """Apply ``body(chunk_states) -> f32[ck]`` over particle chunks via
    ``lax.map``: the per-(particle, cell, kernel-offset) probe
    intermediates are workspace-bounded, so fleets (an extra vmapped
    batch axis) don't materialize the full [B, N, C, K] tensors (~18 GB
    at 64x4096x60x9 — past HBM)."""
    ck = min(particle_chunk, n)
    n_pad = -(-n // ck) * ck

    def pad(leaf):
        widths = [(0, n_pad - n)] + [(0, 0)] * (leaf.ndim - 1)
        return jnp.pad(leaf, widths, mode="edge")

    stc = jax.tree_util.tree_map(
        lambda l: pad(l).reshape(n_pad // ck, ck, *l.shape[1:]), states
    )
    return jax.lax.map(body, stc).reshape(n_pad)[:n]


def ndt_weights_2d(
    params: NdtModelParams,
    ndt_map: NdtMap,
    states: SE2,
    meas_means: Array,
    meas_covs: Array,
    cell_mask: Array,
    particle_chunk: int = 512,
) -> Array:
    """Per-particle weights ``1.0 + Σ_cells max(kernel_lik, min_lik)``
    (hpp:218-239); ``f32[N]``."""

    def body(st):
        # transform measurement cells by each particle state
        # (ndt_cell.hpp:63-68)
        c, s = st.rot.cos[:, None], st.rot.sin[:, None]
        mx = meas_means[None, :, 0]
        my = meas_means[None, :, 1]
        tx = c * mx - s * my + st.x[:, None]
        ty = s * mx + c * my + st.y[:, None]
        mean_w = jnp.stack([tx, ty], -1)  # [ck, C, 2]

        rot = jnp.stack(
            [jnp.stack([st.rot.cos, -st.rot.sin], -1),
             jnp.stack([st.rot.sin, st.rot.cos], -1)],
            -2,
        )  # [ck, 2, 2]
        cov_w = jnp.einsum("nab,cbd,ned->ncae", rot, meas_covs, rot)

        lik = _kernel_likelihood(ndt_map, params, mean_w, cov_w, KERNEL_2D)
        lik = jnp.maximum(lik, params.minimum_likelihood)
        return 1.0 + jnp.sum(jnp.where(cell_mask[None, :], lik, 0.0), axis=-1)

    return _chunked_over_particles(states, states.x.shape[0], particle_chunk,
                                   body)


def ndt_weights_3d(
    params: NdtModelParams,
    ndt_map: NdtMap,
    states: SE3,
    meas_means: Array,
    meas_covs: Array,
    cell_mask: Array,
    particle_chunk: int = 512,
) -> Array:
    """3D variant over SE3 states; ``f32[N]``."""

    def body(st):
        rot = st.rot.as_matrix()  # [ck, 3, 3]
        mean_w = (
            jnp.einsum("nab,cb->nca", rot, meas_means) + st.xyz[:, None, :]
        )  # [ck, C, 3]
        cov_w = jnp.einsum("nab,cbd,ned->ncae", rot, meas_covs, rot)

        lik = _kernel_likelihood(ndt_map, params, mean_w, cov_w, KERNEL_3D)
        lik = jnp.maximum(lik, params.minimum_likelihood)
        return 1.0 + jnp.sum(jnp.where(cell_mask[None, :], lik, 0.0), axis=-1)

    return _chunked_over_particles(states, states.xyz.shape[0],
                                   particle_chunk, body)


def ndt_likelihood_at(params: NdtModelParams, ndt_map: NdtMap, mean: Array, cov: Array):
    """Scalar ``likelihood_at`` for a single measurement Gaussian
    (hpp:229-239) — used by tests for golden-value parity."""
    d = mean.shape[-1]
    kernel = KERNEL_2D if d == 2 else KERNEL_3D
    lik = _kernel_likelihood(ndt_map, params, mean[None], cov[None], kernel)[0]
    return jnp.maximum(lik, params.minimum_likelihood)
