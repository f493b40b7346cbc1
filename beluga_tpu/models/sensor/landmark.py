"""Landmark (range+bearing) and bearing-only sensor models.

TPU re-designs of ``sensor/landmark_sensor_model.hpp`` and
``sensor/bearing_sensor_model.hpp`` over the brute-force landmark map
(``sensor/data/landmark_map.hpp``).  The map is a padded dense array of
(position, category); nearest-landmark search is a masked argmin over all
landmarks evaluated for all (particle, detection) pairs at once — the
reference's O(L) linear scan, vectorized.

Both models support SE2 states (embedded on the z=0 plane, matching the
reference's footprint convention, landmark_sensor_model.hpp:96-107) and SE3
states.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from beluga_tpu.lie import SE2, SE3, to_3d

Array = jax.Array


def _dc(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@dataclasses.dataclass(frozen=True)
class LandmarkModelParams:
    """(landmark_sensor_model.hpp:44-48)."""

    sigma_range: float = 1.0
    sigma_bearing: float = 1.0
    random_prob: float = 1e-4


@dataclasses.dataclass(frozen=True)
class BearingModelParams:
    """(bearing_sensor_model.hpp:42-45); the sensor pose is passed to the
    weight function separately (it is an SE3 pytree, not a static float)."""

    sigma_bearing: float = 1.0


@_dc
class LandmarkMap:
    """Padded landmark set: world positions ``f32[L, 3]``, integer categories
    ``i32[L]``, validity mask ``bool[L]``."""

    positions: Array
    categories: Array
    valid: Array


def make_landmark_map(positions, categories) -> LandmarkMap:
    import numpy as np

    positions = jnp.asarray(np.asarray(positions, np.float32))
    categories = jnp.asarray(np.asarray(categories, np.int32))
    return LandmarkMap(
        positions=positions,
        categories=categories,
        valid=jnp.ones(positions.shape[0], bool),
    )


def _states_to_se3(states) -> SE3:
    if isinstance(states, SE2):
        return to_3d(states)
    return states


def _rot_expand(rot, v: Array) -> Array:
    """Apply per-particle rotations ``[N]`` to per-detection vectors
    ``[1, D, 3]`` → ``[N, D, 3]`` (explicit broadcast of the quaternion over
    the detection axis)."""
    from beluga_tpu.lie import SO3

    return SO3(rot.q[:, None, :]).act(v)


def landmark_weights(
    params: LandmarkModelParams,
    lmap: LandmarkMap,
    states,
    detections: Array,
    detection_categories: Array,
    detection_mask: Array,
) -> Array:
    """Per-particle weights ``Π_detections (p_range · p_bearing + random_prob)``
    (landmark_sensor_model.hpp:109-156); ``f32[N]``.

    ``detections``: ``f32[D, 3]`` positions in the robot frame.
    """
    pose = _states_to_se3(states)  # SE3 [N]
    n = pose.xyz.shape[0]

    det_range = jnp.linalg.norm(detections, axis=-1)  # [D]
    det_bearing = detections / jnp.maximum(det_range, 1e-12)[:, None]  # [D, 3]

    # detections in the world frame per particle: [N, D, 3]
    det_world = _rot_expand(pose.rot, detections[None, :, :]) + pose.xyz[:, None, :]

    # nearest same-category landmark (linear scan): [N, D, L]
    diff = det_world[:, :, None, :] - lmap.positions[None, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    cat_ok = (
        lmap.valid[None, None, :]
        & (lmap.categories[None, None, :] == detection_categories[None, :, None])
    )
    d2 = jnp.where(cat_ok, d2, jnp.inf)
    nearest = jnp.argmin(d2, axis=-1)  # [N, D]
    found = jnp.take_along_axis(cat_ok, nearest[..., None], axis=-1)[..., 0]

    lm_world = lmap.positions[nearest]  # [N, D, 3]
    # landmark in robot frame
    inv = pose.inverse()
    lm_robot = _rot_expand(inv.rot, lm_world) + inv.xyz[:, None, :]
    lm_range = jnp.linalg.norm(lm_robot, axis=-1)
    lm_bearing = lm_robot / jnp.maximum(lm_range, 1e-12)[..., None]

    cos_ap = jnp.sum(lm_bearing * det_bearing[None], axis=-1)
    sin_ap = jnp.linalg.norm(jnp.cross(lm_bearing, jnp.broadcast_to(det_bearing[None], lm_bearing.shape)), axis=-1)
    bearing_error = jnp.arctan2(sin_ap, cos_ap)
    range_error = det_range[None] - lm_range

    p_range = jnp.exp(-jnp.square(range_error) / (2.0 * params.sigma_range**2))
    p_bearing = jnp.exp(-jnp.square(bearing_error) / (2.0 * params.sigma_bearing**2))
    pz = jnp.where(found, p_range * p_bearing + params.random_prob, params.random_prob)
    pz = jnp.where(detection_mask[None, :], pz, 1.0)
    return jnp.prod(pz, axis=-1)


def bearing_weights(
    params: BearingModelParams,
    lmap: LandmarkMap,
    states,
    bearings: Array,
    detection_categories: Array,
    detection_mask: Array,
    sensor_pose_in_robot: SE3 | None = None,
) -> Array:
    """Per-particle weights ``Π p_bearing`` with best-aligned landmark match
    (bearing_sensor_model.hpp:89-141); ``f32[N]``.

    ``bearings``: ``f32[D, 3]`` unit detection bearings in the sensor frame.
    """
    pose = _states_to_se3(states)
    if sensor_pose_in_robot is not None:
        pose = pose @ sensor_pose_in_robot

    det_bearing = bearings / jnp.linalg.norm(bearings, axis=-1, keepdims=True)

    # landmarks in the sensor frame: [N, L, 3]
    inv = pose.inverse()
    lm_sensor = _rot_expand(inv.rot, lmap.positions[None, :, :]) + inv.xyz[:, None, :]
    lm_bearing = lm_sensor / jnp.maximum(
        jnp.linalg.norm(lm_sensor, axis=-1, keepdims=True), 1e-12
    )

    # best-aligned same-category landmark by max dot product: [N, D, L]
    dots = jnp.einsum("nlk,dk->ndl", lm_bearing, det_bearing)
    cat_ok = (
        lmap.valid[None, None, :]
        & (lmap.categories[None, None, :] == detection_categories[None, :, None])
    )
    dots = jnp.where(cat_ok, dots, -jnp.inf)
    best = jnp.argmax(dots, axis=-1)  # [N, D]
    found = jnp.take_along_axis(cat_ok, best[..., None], axis=-1)[..., 0]

    chosen = jnp.take_along_axis(
        lm_bearing[:, None, :, :], best[..., None, None], axis=2
    )[:, :, 0, :]  # [N, D, 3]
    cos_ap = jnp.sum(chosen * det_bearing[None], axis=-1)
    sin_ap = jnp.linalg.norm(
        jnp.cross(jnp.broadcast_to(det_bearing[None], chosen.shape), chosen), axis=-1
    )
    bearing_error = jnp.arctan2(sin_ap, cos_ap)
    p = jnp.exp(-jnp.square(bearing_error) / (2.0 * params.sigma_bearing**2))
    # unmatched detections weigh 0 (bearing_sensor_model.hpp:116-119)
    pz = jnp.where(found, p, 0.0)
    pz = jnp.where(detection_mask[None, :], pz, 1.0)
    return jnp.prod(pz, axis=-1)
