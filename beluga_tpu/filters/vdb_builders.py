"""3D localization filter over a dense distance voxel map (config #4).

Wires the beluga_vdb-equivalent sensor model (models/sensor/vdb_likelihood)
into the core AMCL loop with SE3 particles: flattened-3D differential-drive
motion, SE3 spatial hashing / estimation / motion gating, and recovery
states drawn around the current estimate (there is no free-cell concept in
a distance volume; the reference 3D nodes use the same estimate-Gaussian
recovery).  Scales to 100k+ particles — the per-particle cost is one fused
(point-transform + voxel lookup) sweep per measurement point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beluga_tpu.algorithms.estimation import estimate_se3
from beluga_tpu.core.random import sample_normal_se3
from beluga_tpu.filters.amcl import AmclModels, AmclParams, se3_motion_delta
from beluga_tpu.maps.voxel import DistanceGrid3
from beluga_tpu.models.motion.differential_drive import (
    DifferentialDriveParams,
    diff_drive_propagate_3d,
)
from beluga_tpu.models.sensor.vdb_likelihood import (
    VdbLikelihoodFieldParams,
    vdb_likelihood_weights,
)
from beluga_tpu.ops.spatial_hash import spatial_hash_se3

Array = jax.Array


def make_vdb_filter_3d(
    grid: DistanceGrid3,
    vdb_params: VdbLikelihoodFieldParams = VdbLikelihoodFieldParams(),
    motion_params: DifferentialDriveParams = DifferentialDriveParams(),
    voxel_size_hint: float | None = None,
):
    """Returns ``(models, ctx)`` for the SE3 VDB likelihood-field filter.

    On TPU the distance lookup uses the int8 codebook one-hot path
    (maps/voxel.py make_distance_codes) when ``voxel_size_hint`` (the host
    float used to build the grid) is given; otherwise the gather path.
    """
    codes_book = None
    if voxel_size_hint is not None and jax.default_backend() == "tpu":
        from beluga_tpu.maps.voxel import make_distance_codes

        codes_book = make_distance_codes(
            grid, voxel_size_hint, vdb_params.max_obstacle_distance
        )

    def log_weight(ctx, states, points, point_mask):
        w = vdb_likelihood_weights(
            vdb_params, ctx["vdb_grid"], states, points, point_mask,
            codes_book=ctx.get("vdb_codes"),
        )
        return jnp.log(w)

    def random_state(ctx, key, n, particles):
        mean, cov = estimate_se3(particles.state, particles.weight, particles.mask)
        return sample_normal_se3(key, n, mean, cov + 1e-6 * jnp.eye(6))

    def propagate(ctx, key, states, pose, prev):
        del ctx
        return diff_drive_propagate_3d(motion_params, key, states, pose, prev)

    def hash_state(params: AmclParams, states):
        return spatial_hash_se3(
            states.xyz,
            states.rot.rpy(),
            params.spatial_resolution_x,
            params.spatial_resolution_theta,
        )

    def estimate(params, particles):
        del params
        return estimate_se3(particles.state, particles.weight, particles.mask)

    models = AmclModels(
        propagate=propagate,
        log_weight=log_weight,
        random_state=random_state,
        hash_state=hash_state,
        estimate=estimate,
        motion_delta=se3_motion_delta,
    )
    ctx = {"vdb_grid": grid}
    if codes_book is not None:
        ctx["vdb_codes"] = codes_book
    return models, ctx
