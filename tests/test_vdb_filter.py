"""3D VDB-style localization filter (config #4 analog, CPU-sized)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.core.random import sample_normal_se3
from beluga_tpu.filters.amcl import AmclParams, init_state, update
from beluga_tpu.filters.vdb_builders import make_vdb_filter_3d
from beluga_tpu.lie import SE3, SO3
from beluga_tpu.maps.voxel import make_distance_grid_from_points


def make_world():
    """A room: floor plane, two walls, a pillar (obstacle point cloud)."""
    pts = []
    for x in np.arange(0, 8, 0.2):
        for y in np.arange(0, 8, 0.2):
            pts.append([x, y, 0.0])                     # floor
    for t in np.arange(0, 8, 0.1):
        for z in np.arange(0, 2.5, 0.25):
            pts.append([t, 0.0, z])                     # wall y=0
            pts.append([0.0, t, z])                     # wall x=0
    for z in np.arange(0, 2.0, 0.2):
        pts.append([5.0, 5.0, z])                       # pillar
    return make_distance_grid_from_points(pts, 0.2, max_distance=5.0)


def simulate_points(world_pts, pose_xyzrpy, n=80, sigma=0.02, seed=0):
    """Measurement = world obstacle points transformed into the robot frame."""
    rng = np.random.default_rng(seed)
    sel = world_pts[rng.integers(0, len(world_pts), n)]
    x, y, z, roll, pitch, yaw = pose_xyzrpy
    cy, sy = np.cos(yaw), np.sin(yaw)
    r = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    local = (sel - np.array([x, y, z])) @ r  # inverse rotation (yaw only)
    return (local + rng.normal(0, sigma, local.shape)).astype(np.float32)


def test_vdb_filter_tracks_pose():
    grid = make_world()
    models, ctx = make_vdb_filter_3d(grid)
    params = AmclParams(max_particles=400, min_particles=100)

    # world points near the pillar/walls for measurements
    wp = []
    for z in np.arange(0, 2.0, 0.2):
        wp.append([5.0, 5.0, z])
    for t in np.arange(0, 8, 0.4):
        wp.append([t, 0.0, 1.0])
        wp.append([0.0, t, 1.0])
    wp = np.asarray(wp)

    # the flattened-3D diff-drive re-embeds particles at z=0
    # (reference To3d semantics), so the planar robot lives on z=0
    true_pose = (3.0, 3.0, 0.0, 0.0, 0.0, 0.3)
    pts = simulate_points(wp, true_pose)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    mean = SE3(
        jnp.asarray([3.0, 3.0, 0.0], jnp.float32),
        SO3.from_rpy(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.3)),
    )
    states = sample_normal_se3(k1, 400, mean, jnp.eye(6) * 0.05)
    state = init_state(k2, states, params, odom_identity=SE3.identity())

    est = None
    for _ in range(4):
        state = state._replace(force_update=jnp.asarray(True))
        state, est = update(
            params, models, ctx, state, SE3.identity(), jnp.asarray(pts),
            jnp.ones(len(pts), bool),
        )
    assert bool(est.valid)
    xyz = np.asarray(est.pose.xyz)
    assert np.linalg.norm(xyz - [3.0, 3.0, 0.0]) < 0.5
    assert np.asarray(est.covariance).shape == (6, 6)
    assert 100 <= int(state.particles.active) <= 400
