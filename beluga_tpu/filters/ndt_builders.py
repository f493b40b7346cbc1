"""NDT AMCL filter wiring — the NdtAmclNode / NdtAmclNode3D equivalents.

Assembles the core AMCL loop (filters/amcl.py) with:
  * the NDT sensor model over a sparse voxel map (models/sensor/ndt.py);
  * an estimate-based Gaussian recovery generator — random states are drawn
    from a normal distribution around the *current particle estimate*,
    exactly like the reference NDT nodes
    (beluga_amcl/src/ndt_amcl_node.cpp:248-254,
    ndt_amcl_node_3d.cpp analogous);
  * plain (non-cluster) estimation, like core ``beluga::Amcl``
    (amcl_core.hpp:200).

The 3D variant runs SE3 particles with the flattened-3D differential drive
and SE3 spatial hashing / estimation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beluga_tpu.algorithms.estimation import estimate_se2, estimate_se3
from beluga_tpu.core.random import sample_normal_se2, sample_normal_se3
from beluga_tpu.filters.amcl import (
    AmclModels,
    AmclParams,
    default_estimate,
    default_hash_state,
    se3_motion_delta,
)
from beluga_tpu.maps.ndt import NdtMap
from beluga_tpu.models.motion.differential_drive import (
    DifferentialDriveParams,
    diff_drive_propagate,
    diff_drive_propagate_3d,
)
from beluga_tpu.models.sensor.ndt import (
    NdtModelParams,
    fit_measurement_cells,
    ndt_weights_2d,
    ndt_weights_3d,
)
from beluga_tpu.ops.spatial_hash import spatial_hash_se3

Array = jax.Array


def make_ndt_filter_2d(
    ndt_map: NdtMap,
    ndt_params: NdtModelParams = NdtModelParams(minimum_likelihood=1e-6),
    motion_params: DifferentialDriveParams = DifferentialDriveParams(),
):
    """2D NDT AMCL: SE2 states, measurement = 2D point cloud.

    The measurement points are voxel-clustered into Gaussians on device per
    update (ndt_sensor_model.hpp:218-224).  Returns ``(models, ctx)``.
    """

    def log_weight(ctx, states, points, point_mask):
        m: NdtMap = ctx["ndt_map"]
        means, covs, cmask = fit_measurement_cells(points, point_mask, m.resolution)
        w = ndt_weights_2d(ndt_params, m, states, means, covs, cmask)
        return jnp.log(w)

    def random_state(ctx, key, n, particles):
        # Gaussian around the current estimate (ndt_amcl_node.cpp:248-254)
        mean, cov = estimate_se2(particles.state, particles.weight, particles.mask)
        return sample_normal_se2(key, n, mean, cov + 1e-6 * jnp.eye(3))

    def propagate(ctx, key, states, pose, prev):
        del ctx
        return diff_drive_propagate(motion_params, key, states, pose, prev)

    models = AmclModels(
        propagate=propagate,
        log_weight=log_weight,
        random_state=random_state,
        hash_state=default_hash_state,
        estimate=default_estimate,
    )
    return models, {"ndt_map": ndt_map}


def make_ndt_filter_3d(
    ndt_map: NdtMap,
    ndt_params: NdtModelParams = NdtModelParams(minimum_likelihood=1e-6),
    motion_params: DifferentialDriveParams = DifferentialDriveParams(),
):
    """3D NDT AMCL: SE3 states, measurement = 3D point cloud
    (ndt_amcl_node_3d.cpp:398-420)."""

    def log_weight(ctx, states, points, point_mask):
        m: NdtMap = ctx["ndt_map"]
        means, covs, cmask = fit_measurement_cells(points, point_mask, m.resolution)
        w = ndt_weights_3d(ndt_params, m, states, means, covs, cmask)
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
    return models, {"ndt_map": ndt_map}
