"""System-level accuracy tests (tier 4).

The analog of beluga_system_tests/test/test_system.cpp:119-272: replay a
perfect-odometry sensor stream on the turtlebot3_world map and gate
per-update pose error at 0.9 m / 30 deg (test_system.cpp:133-134), with at
least 2 valid updates.  The bag payload is absent from the reference
snapshot, so the stream is regenerated synthetically (simulated LDS-01
scans along a collision-free trajectory, see beluga_tpu/io/replay.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.core.random import sample_normal_se2
from beluga_tpu.filters.amcl import AmclParams, init_state, update
from beluga_tpu.filters.builders import make_likelihood_field_filter
from beluga_tpu.io.replay import ScanSimulator, ScanSpec, drive_trajectory, replay
from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import load_pgm_yaml
from beluga_tpu.models.sensor.likelihood_field import LikelihoodFieldParams

TURTLEBOT_YAML = "/root/reference/beluga_example/maps/turtlebot3_world.yaml"

# baseline filter config (beluga_example/params/default.ros2.yaml)
PARAMS = AmclParams(
    max_particles=2000,
    min_particles=500,
    update_min_d=0.25,
    update_min_a=0.2,
    resample_interval=1,
    alpha_slow=0.001,
    alpha_fast=0.1,
    kld_epsilon=0.05,
    kld_z=3.0,
)
LF_PARAMS = LikelihoodFieldParams(
    max_obstacle_distance=2.0, max_laser_distance=3.5, z_hit=0.5, z_random=0.5, sigma_hit=0.2
)

ERROR_POS_GATE = 0.9  # meters (test_system.cpp:133)
ERROR_YAW_GATE = np.deg2rad(30.0)  # (test_system.cpp:134)


@pytest.fixture(scope="module")
def world():
    grid = load_pgm_yaml(TURTLEBOT_YAML)
    models, ctx = make_likelihood_field_filter(grid, LF_PARAMS)
    sim = ScanSimulator(grid, ScanSpec())
    return grid, models, ctx, sim


@pytest.mark.parametrize("selective_resampling", [False, True])
def test_perfect_odometry_accuracy_gate(world, selective_resampling):
    grid, models, ctx, sim = world
    params = PARAMS.__class__(**{**PARAMS.__dict__, "selective_resampling": selective_resampling})

    traj = drive_trajectory(grid, start_xy=(-1.7, 0.5), num_steps=120, seed=3)

    k_init, k_state = jax.random.split(jax.random.PRNGKey(42))
    start = SE2.from_xytheta(*traj[0])
    init_cov = jnp.diag(jnp.asarray([0.25, 0.25, 0.0685]))  # nav2 defaults
    states = sample_normal_se2(k_init, params.max_particles, start, init_cov)
    state = init_state(k_state, states, params)

    step = jax.jit(functools.partial(update, params, models, ctx))

    state, results = replay(step, state, traj, sim, noise_sigma=0.01)

    checked = 0
    for (x, y, yaw), est in results:
        if not bool(est.valid):
            continue
        checked += 1
        err_pos = np.hypot(float(est.pose.x) - x, float(est.pose.y) - y)
        err_yaw = abs(
            np.arctan2(np.sin(float(est.pose.theta) - yaw), np.cos(float(est.pose.theta) - yaw))
        )
        assert err_pos <= ERROR_POS_GATE, f"position error {err_pos:.3f} m at step {checked}"
        assert err_yaw <= ERROR_YAW_GATE, f"yaw error {np.rad2deg(err_yaw):.1f} deg"
    assert checked >= 2, "filter never produced valid updates"


def test_tracking_converges_tightly(world):
    """Stronger-than-gate check: with perfect odometry the estimate should
    track well below the gate after a few updates."""
    grid, models, ctx, sim = world
    traj = drive_trajectory(grid, start_xy=(-1.7, 0.5), num_steps=80, seed=4)

    k_init, k_state = jax.random.split(jax.random.PRNGKey(0))
    start = SE2.from_xytheta(*traj[0])
    states = sample_normal_se2(
        k_init, PARAMS.max_particles, start, jnp.diag(jnp.asarray([0.1, 0.1, 0.05]))
    )
    state = init_state(k_state, states, PARAMS)
    step = jax.jit(functools.partial(update, PARAMS, models, ctx))
    state, results = replay(step, state, traj, sim, noise_sigma=0.01)

    errs = [
        np.hypot(float(e.pose.x) - x, float(e.pose.y) - y)
        for (x, y, _), e in results
        if bool(e.valid)
    ]
    assert len(errs) >= 5
    # final third of the run should be tightly converged
    tail = errs[-max(3, len(errs) // 3):]
    assert np.mean(tail) < 0.2, f"mean tail error {np.mean(tail):.3f}"
