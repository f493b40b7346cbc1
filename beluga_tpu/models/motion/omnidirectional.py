"""Sampled omnidirectional-drive odometry motion model (nav2 omni parity).

TPU re-design of ``motion/omnidirectional_drive_model.hpp``: adds a strafe
noise term (alpha5) to the differential-drive decomposition.  The sampled
update is ``state * SE2(rot1, 0) * SE2(rot_draw - rot1, (trans_draw,
-strafe_draw))`` (omnidirectional_drive_model.hpp:133-147).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from beluga_tpu.lie import SE2, SO2
from beluga_tpu.models.motion.differential_drive import _rotation_variance, _wrap

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class OmnidirectionalDriveParams:
    rotation_noise_from_rotation: float = 0.2  # alpha1
    rotation_noise_from_translation: float = 0.2  # alpha2
    translation_noise_from_translation: float = 0.2  # alpha3
    translation_noise_from_rotation: float = 0.2  # alpha4
    strafe_noise_from_translation: float = 0.2  # alpha5
    distance_threshold: float = 0.01


def omni_drive_propagate(
    params: OmnidirectionalDriveParams,
    key: Array,
    states: SE2,
    pose: SE2,
    previous_pose: SE2,
) -> SE2:
    """Vectorized sampler (omnidirectional_drive_model.hpp:101-147)."""
    translation = pose.xy - previous_pose.xy
    distance = jnp.linalg.norm(translation, axis=-1)
    distance_variance = distance * distance

    rotation = _wrap(pose.theta - previous_pose.theta)
    heading = jnp.arctan2(translation[..., 1], translation[..., 0])
    first_rotation = jnp.where(
        distance > params.distance_threshold,
        _wrap(heading - previous_pose.theta),
        0.0,
    )
    rv = _rotation_variance(rotation)

    rot_std = jnp.sqrt(
        params.rotation_noise_from_rotation * rv
        + params.rotation_noise_from_translation * distance_variance
    )
    trans_std = jnp.sqrt(
        params.translation_noise_from_translation * distance_variance
        + params.translation_noise_from_rotation * rv
    )
    strafe_std = jnp.sqrt(
        params.strafe_noise_from_translation * distance_variance
        + params.translation_noise_from_rotation * rv
    )

    n = states.shape[0]
    z = jax.random.normal(key, (3, n), jnp.float32)
    rot_draw = rotation + rot_std * z[0]
    trans_draw = distance + trans_std * z[1]
    strafe_draw = -(strafe_std * z[2])

    theta1 = states.theta + first_rotation
    c, s = jnp.cos(theta1), jnp.sin(theta1)
    dx = c * trans_draw - s * strafe_draw
    dy = s * trans_draw + c * strafe_draw
    new_xy = states.xy + jnp.stack([dx, dy], axis=-1)
    # second_rotation = rot_draw - first_rotation, so the final heading is
    # theta + rot_draw.
    return SE2(new_xy, SO2.exp(states.theta + rot_draw))
