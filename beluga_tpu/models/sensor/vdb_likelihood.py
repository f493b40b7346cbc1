"""3D likelihood-field sensor model over a dense distance voxel grid.

TPU re-design of the beluga_vdb extension
(beluga_vdb/sensor/vdb_likelihood_field_model.hpp:48-174): per measurement
point, transform into the world frame by the particle state, look up the
distance-to-nearest-obstacle volume with cell-centered rounding (background
outside), and accumulate ``1.0 + Σ amplitude·exp(-d²/2σ²) + offset``.
Supports SE2 states (via the planar embedding, like the reference's
``To3d``) and SE3 states.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from beluga_tpu.lie import SE2, SE3, SO3, to_3d
from beluga_tpu.maps.voxel import DistanceGrid3

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VdbLikelihoodFieldParams:
    """(vdb_likelihood_field_model.hpp:48-66)."""

    max_obstacle_distance: float = 100.0
    max_laser_distance: float = 2.0
    z_hit: float = 0.5
    z_random: float = 0.5
    sigma_hit: float = 0.2


def vdb_likelihood_weights(
    params: VdbLikelihoodFieldParams,
    grid: DistanceGrid3,
    states,
    points: Array,
    point_mask: Array,
    codes_book=None,
) -> Array:
    """Per-particle weights ``1.0 + Σ_points (amp·exp(-d²/2σ²) + offset)``
    (vdb_likelihood_field_model.hpp:135-152); ``f32[N]``.

    ``points``: ``f32[P, 3]`` measurement points already in the robot/base
    frame (the reference pre-applies the sensor origin, hpp:136-141).
    """
    two_squared_sigma = 2.0 * params.sigma_hit * params.sigma_hit
    amplitude = params.z_hit / (params.sigma_hit * jnp.sqrt(2.0 * jnp.pi))
    offset = params.z_random / params.max_laser_distance

    pose = to_3d(states) if isinstance(states, SE2) else states  # SE3 [N]
    rot = SO3(pose.rot.q[:, None, :])  # broadcast over the point axis
    pts_world = rot.act(points[None, :, :]) + pose.xyz[:, None, :]  # [N, P, 3]

    dist = grid.distance_at(pts_world, codes_book=codes_book)  # [N, P]
    pz = amplitude * jnp.exp(-jnp.square(dist) / two_squared_sigma) + offset
    return 1.0 + jnp.sum(jnp.where(point_mask[None, :], pz, 0.0), axis=-1)


def vdb_likelihood_log_weights(params, grid, states, points, point_mask,
                               codes_book=None) -> Array:
    return jnp.log(vdb_likelihood_weights(
        params, grid, states, points, point_mask, codes_book=codes_book))
