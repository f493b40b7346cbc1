"""Sampled differential-drive odometry motion model (Thrun table 5.6).

TPU re-design of ``motion/differential_drive_model.hpp``: the control-action
decomposition (rot1 – translate – rot2 and their noise scales) is computed
once per update from the odometry delta, then a single vectorized sampler
perturbs every particle with three Gaussian draws
(differential_drive_model.hpp:129-164).

Supports SE2 states directly; the (flattened) SE3 variant wraps the 2D
sampler through the planar embedding exactly like the reference
(differential_drive_model.hpp:122-127).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from beluga_tpu.lie import SE2, SE3, SO2, to_2d, to_3d

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DifferentialDriveParams:
    """alpha1..alpha4 noise parameters (differential_drive_model.hpp:40-68)."""

    rotation_noise_from_rotation: float = 0.2  # alpha1
    rotation_noise_from_translation: float = 0.2  # alpha2
    translation_noise_from_translation: float = 0.2  # alpha3
    translation_noise_from_rotation: float = 0.2  # alpha4
    distance_threshold: float = 0.01


def _rotation_variance(theta: Array) -> Array:
    """Symmetric forward/backward rotation noise: min(|θ|, |θ ± π|)²
    (differential_drive_model.hpp:167-173)."""
    flipped = SO2.exp(theta + jnp.pi).log()
    delta = jnp.minimum(jnp.abs(theta), jnp.abs(flipped))
    return delta * delta


def _wrap(theta: Array) -> Array:
    return SO2.exp(theta).log()


def diff_drive_decompose(params: DifferentialDriveParams, pose: SE2, previous_pose: SE2):
    """Per-update precomputation (differential_drive_model.hpp:129-155).

    Returns the three (mean, stddev) Normal parameter pairs for
    rot1 / translation / rot2 as scalar arrays.
    """
    translation = pose.xy - previous_pose.xy
    distance = jnp.linalg.norm(translation, axis=-1)
    distance_variance = distance * distance

    heading = jnp.arctan2(translation[..., 1], translation[..., 0])
    first_rotation = jnp.where(
        distance > params.distance_threshold,
        _wrap(heading - previous_pose.theta),
        0.0,
    )
    second_rotation = _wrap(pose.theta - previous_pose.theta - first_rotation)

    rv1 = _rotation_variance(first_rotation)
    rv2 = _rotation_variance(second_rotation)

    first_std = jnp.sqrt(
        params.rotation_noise_from_rotation * rv1
        + params.rotation_noise_from_translation * distance_variance
    )
    trans_std = jnp.sqrt(
        params.translation_noise_from_translation * distance_variance
        + params.translation_noise_from_rotation * (rv1 + rv2)
    )
    second_std = jnp.sqrt(
        params.rotation_noise_from_rotation * rv2
        + params.rotation_noise_from_translation * distance_variance
    )
    return (first_rotation, first_std), (distance, trans_std), (second_rotation, second_std)


def diff_drive_propagate(
    params: DifferentialDriveParams,
    key: Array,
    states: SE2,
    pose: SE2,
    previous_pose: SE2,
) -> SE2:
    """Sample new states for every particle.

    Per particle: ``state * SE2(rot1, 0) * SE2(rot2, (trans, 0))``
    (differential_drive_model.hpp:156-163).
    """
    (r1_mu, r1_sd), (t_mu, t_sd), (r2_mu, r2_sd) = diff_drive_decompose(
        params, pose, previous_pose
    )
    n = states.shape[0]
    z = jax.random.normal(key, (3, n), jnp.float32)
    rot1 = r1_mu + r1_sd * z[0]
    trans = t_mu + t_sd * z[1]
    rot2 = r2_mu + r2_sd * z[2]

    # state * SE2(rot1, 0) * SE2(rot2, (trans, 0)) expanded:
    # heading after rot1 rotates the translation (trans, 0).
    theta1 = states.theta + rot1
    new_xy = states.xy + jnp.stack([jnp.cos(theta1) * trans, jnp.sin(theta1) * trans], -1)
    new_rot = SO2.exp(theta1 + rot2)
    return SE2(new_xy, new_rot)


def diff_drive_propagate_3d(
    params: DifferentialDriveParams,
    key: Array,
    states: SE3,
    pose: SE3,
    previous_pose: SE3,
) -> SE3:
    """Flattened-3D variant: project controls and states to the plane, run the
    2D sampler, re-embed (differential_drive_model.hpp:122-127)."""
    new_2d = diff_drive_propagate(
        params, key, to_2d(states), to_2d(pose), to_2d(previous_pose)
    )
    return to_3d(new_2d)
