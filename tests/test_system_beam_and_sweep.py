"""System configs #2 and #3 from BASELINE.json.

#2 AMCL parity: beam ray-cast sensor + KLD-adaptive resampling on the
   turtlebot3_world map with per-update accuracy gates.
#3 omnidirectional motion + NDT sensor + resampling-strategy sweep
   (multinomial / systematic / stratified / residual).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.core.random import sample_normal_se2
from beluga_tpu.filters.amcl import (
    AmclModels,
    AmclParams,
    default_estimate,
    default_hash_state,
    init_state,
    update,
)
from beluga_tpu.filters.builders import make_grid_random_state_fn, make_motion_fn
from beluga_tpu.filters.ndt_builders import make_ndt_filter_2d
from beluga_tpu.io.replay import ScanSimulator, ScanSpec, drive_trajectory, replay
from beluga_tpu.lie import SE2
from beluga_tpu.maps.ndt import load_ndt_hdf5
from beluga_tpu.maps.occupancy import load_pgm_yaml
from beluga_tpu.models.motion.differential_drive import DifferentialDriveParams
from beluga_tpu.models.motion.omnidirectional import OmnidirectionalDriveParams
from beluga_tpu.models.sensor.beam import BeamModelParams, beam_log_weights

TURTLEBOT_YAML = "/root/reference/beluga_example/maps/turtlebot3_world.yaml"
TURTLEBOT_NDT = "/root/reference/beluga/test/beluga/test_data/turtlebot3_world.hdf5"


def test_beam_model_system_accuracy():
    """Config #2: beam sensor + KLD on the reference map, 0.9m/30deg gates."""
    grid = load_pgm_yaml(TURTLEBOT_YAML)
    params = AmclParams(max_particles=1000, min_particles=250)
    beam_params = BeamModelParams(
        z_hit=0.7, z_short=0.1, z_max=0.05, z_rand=0.15,
        sigma_hit=0.2, lambda_short=0.1, beam_max_range=3.5,
    )
    res_hint = grid.resolution_hint

    def log_weight(ctx, states, points, beam_mask):
        return beam_log_weights(
            beam_params, ctx["grid"], states, points, beam_mask,
            resolution_hint=res_hint,
        )

    models = AmclModels(
        propagate=make_motion_fn(DifferentialDriveParams()),
        log_weight=log_weight,
        random_state=make_grid_random_state_fn(),
        hash_state=default_hash_state,
        estimate=default_estimate,
    )
    ctx = {"grid": grid}

    sim = ScanSimulator(grid, ScanSpec(num_beams=180, max_beams=40))
    traj = drive_trajectory(grid, start_xy=(-1.7, 0.5), num_steps=60, seed=5)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    start = SE2.from_xytheta(*traj[0])
    states = sample_normal_se2(k1, 1000, start, jnp.diag(jnp.asarray([0.1, 0.1, 0.05])))
    state = init_state(k2, states, params)
    step = jax.jit(functools.partial(update, params, models, ctx))
    state, results = replay(step, state, traj, sim, noise_sigma=0.01)

    checked = 0
    for (x, y, yaw), est in results:
        if not bool(est.valid):
            continue
        checked += 1
        err = np.hypot(float(est.pose.x) - x, float(est.pose.y) - y)
        yerr = abs(np.arctan2(np.sin(float(est.pose.theta) - yaw),
                              np.cos(float(est.pose.theta) - yaw)))
        assert err <= 0.9, f"beam-model position error {err:.3f}"
        assert yerr <= np.deg2rad(30.0)
    assert checked >= 2


@pytest.mark.parametrize(
    "strategy", ["multinomial", "systematic", "stratified", "residual"]
)
def test_omni_ndt_resampling_sweep(strategy):
    """Config #3: omni motion + NDT sensor across all resampling strategies."""
    ndt_map = load_ndt_hdf5(TURTLEBOT_NDT)
    models, ctx = make_ndt_filter_2d(ndt_map)
    models = models._replace(
        propagate=make_motion_fn(OmnidirectionalDriveParams(0.05, 0.05, 0.05, 0.05, 0.05))
    )
    params = AmclParams(max_particles=300, min_particles=60, resampling=strategy)

    rng = np.random.default_rng(1)
    n = int(ndt_map.num_cells)
    sel = rng.choice(n, size=min(8, n), replace=False)
    means = np.asarray(ndt_map.means)[sel]
    pts = means[rng.integers(0, len(means), 60)] + rng.normal(0, 0.05, (60, 2))
    pts, mask = jnp.asarray(pts, jnp.float32), jnp.ones(60, bool)

    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    states = sample_normal_se2(k1, 300, SE2.identity(), jnp.eye(3) * 0.2)
    state = init_state(k2, states, params)
    est = None
    for _ in range(5):
        state = state._replace(force_update=jnp.asarray(True))
        state, est = update(params, models, ctx, state, SE2.identity(), pts, mask)
    assert bool(est.valid)
    assert np.hypot(float(est.pose.x), float(est.pose.y)) < 0.5, strategy
    assert 60 <= int(state.particles.active) <= 300
