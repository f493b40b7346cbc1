"""Weighted mean / covariance estimation over particle sets.

Vectorized ports of ``algorithm/estimation.hpp``:
  * SE2 estimate (estimation.hpp:436-475): coefficient-average of the
    (cos, sin, x, y) representation; translation covariance with the
    ``1 / (1 - Σw²)`` unbiased correction (estimation.hpp:270); yaw variance
    from the circular standard deviation ``-2 log ‖mean complex‖``; the
    degenerate all-cancelled case returns yaw 0 with infinite variance.
  * Euclidean mean/cov for vector states (estimation.hpp:230-307).
  * SE3 estimate: mean via translation average + quaternion chordal mean
    (the 4x4 outer-product eigenvector method the reference uses for
    quaternion averaging), covariance in the tangent space at the mean
    (estimation.hpp:319-358).

All estimators take *unnormalized* weights and normalize internally, like
``beluga::estimate`` (estimation.hpp:408-428).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beluga_tpu.lie import SE2, SE3, SO2, SO3

Array = jax.Array


def _normalize_weights(weights: Array, mask: Array | None) -> Array:
    w = weights.astype(jnp.float32)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    return w / jnp.maximum(jnp.sum(w), 1e-38)


def estimate_scalar(values: Array, weights: Array, mask: Array | None = None):
    """Weighted mean and bias-corrected variance of scalar values."""
    w = _normalize_weights(weights, mask)
    mean = jnp.sum(w * values)
    sq_sum = jnp.sum(w * w)
    var = jnp.sum(w * jnp.square(values - mean)) / jnp.maximum(1.0 - sq_sum, 1e-9)
    return mean, var


def estimate_vector(values: Array, weights: Array, mask: Array | None = None):
    """Weighted mean and covariance of ``f32[N, D]`` vectors."""
    w = _normalize_weights(weights, mask)
    mean = jnp.sum(w[:, None] * values, axis=0)
    centered = values - mean
    sq_sum = jnp.sum(w * w)
    cov = (centered.T * w) @ centered / jnp.maximum(1.0 - sq_sum, 1e-9)
    return mean, cov


def estimate_se2(states: SE2, weights: Array, mask: Array | None = None):
    """SE2 mean pose + 3x3 covariance (estimation.hpp:436-475).

    Returns ``(SE2 mean, f32[3, 3] covariance)`` with covariance layout
    (x, y, yaw).
    """
    w = _normalize_weights(weights, mask)
    sq_sum = jnp.sum(w * w)
    corr = jnp.maximum(1.0 - sq_sum, 1e-9)

    mean_xy = jnp.sum(w[:, None] * states.xy, axis=0)
    mean_z = jnp.sum(w[:, None] * states.rot.z, axis=0)  # unnormalized complex

    centered = states.xy - mean_xy
    cov_t = (centered.T * w) @ centered / corr  # 2x2

    norm = jnp.linalg.norm(mean_z)
    degenerate = norm < 1e-7
    yaw_var = jnp.where(degenerate, jnp.inf, -2.0 * jnp.log(jnp.maximum(norm, 1e-38)))
    # identity complex built from ops (not a captured constant array: traced
    # array constants become hoisted executable parameters and jax 0.9's jit
    # fastpath mishandles them after cond branches are traced eagerly)
    identity_z = jnp.stack([jnp.ones_like(norm), jnp.zeros_like(norm)])
    mean_rot = SO2(
        jnp.where(degenerate, identity_z, mean_z / jnp.maximum(norm, 1e-38))
    )

    cov = jnp.zeros((3, 3), jnp.float32)
    cov = cov.at[:2, :2].set(cov_t)
    cov = cov.at[2, 2].set(yaw_var)
    return SE2(mean_xy, mean_rot), cov


def estimate_se3(states: SE3, weights: Array, mask: Array | None = None):
    """SE3 mean pose + 6x6 tangent-space covariance (estimation.hpp:319-358).

    The rotation mean is the chordal (eigenvector-of-outer-product-sum)
    quaternion average; covariance is of ``log(mean⁻¹ · state)`` with the
    same ``1/(1-Σw²)`` correction.  Tangent layout (vx, vy, vz, wx, wy, wz).
    """
    w = _normalize_weights(weights, mask)
    sq_sum = jnp.sum(w * w)
    corr = jnp.maximum(1.0 - sq_sum, 1e-9)

    mean_xyz = jnp.sum(w[:, None] * states.xyz, axis=0)
    q = states.rot.q
    m = jnp.einsum("n,ni,nj->ij", w, q, q)
    _, vecs = jnp.linalg.eigh(m)
    mean_q = vecs[:, -1]
    mean_q = mean_q * jnp.where(mean_q[0] < 0, -1.0, 1.0)
    mean = SE3(mean_xyz, SO3.from_quat_wxyz(mean_q))

    delta = (mean.inverse() @ states).log()  # [N, 6]
    cov = jnp.einsum("n,ni,nj->ij", w, delta, delta) / corr
    return mean, cov
