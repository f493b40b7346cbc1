"""System gate for the windowed-scan-LUT fast path (VERDICT r2 #5).

Full synthetic-bag replay on the turtlebot3_world map through
``make_windowed_scan_filter`` with forced recovery bursts mid-trajectory:
the 0.9 m / 30 deg gate (test_system.cpp:133-134) must hold in steady
state, the coverage gate must flap to the exact path on each burst, and
the fast path must re-engage within a few updates.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.core.random import sample_normal_se2, sample_uniform_free_cells
from beluga_tpu.filters.amcl import AmclParams, init_state, update
from beluga_tpu.filters.builders import make_windowed_scan_filter
from beluga_tpu.io.replay import ScanSimulator, ScanSpec, drive_trajectory
from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import load_pgm_yaml
from beluga_tpu.models.sensor.likelihood_field import LikelihoodFieldParams
from beluga_tpu.models.sensor.likelihood_field_winlut import (
    windowed_coverage_tiled_from_center,
)

TURTLEBOT_YAML = "/root/reference/beluga_example/maps/turtlebot3_world.yaml"
ERROR_POS_GATE = 0.9
ERROR_YAW_GATE = np.deg2rad(30.0)

N = 1024
GEO = dict(k_bins=64, win=128, max_point_radius=3.6)
TILE, TBLK = 128, 16
THRESH = 0.98
BURSTS = (28, 44)  # steps at which 25% of the cloud is scattered uniformly


@pytest.fixture(scope="module")
def world():
    grid = load_pgm_yaml(TURTLEBOT_YAML)
    lfp = LikelihoodFieldParams(
        max_obstacle_distance=2.0, max_laser_distance=3.5,
        z_hit=0.5, z_random=0.5, sigma_hit=0.2,
    )
    models, ctx = make_windowed_scan_filter(
        grid, lfp, tile=TILE, tblk=TBLK, coverage_threshold=THRESH, **GEO
    )
    sim = ScanSimulator(grid, ScanSpec())
    return grid, models, ctx, sim


def test_winlut_replay_with_recovery_bursts(world):
    grid, models, ctx, sim = world
    # per-step updates (no motion gating) so burst recovery is paced in
    # valid updates — the reference gate only considers valid updates too
    params = AmclParams(
        max_particles=N, min_particles=N, sorted_slots=True,
        update_min_d=0.0, update_min_a=0.0,
    )
    traj = drive_trajectory(grid, start_xy=(-1.7, 0.5), num_steps=60, seed=3)

    k_init, k_state = jax.random.split(jax.random.PRNGKey(42))
    start = SE2.from_xytheta(*traj[0])
    states = sample_normal_se2(
        k_init, N, start, jnp.diag(jnp.asarray([0.1, 0.1, 0.05]))
    )
    from beluga_tpu.core.particles import tree_take

    states = tree_take(states, jnp.argsort(states.theta))
    state = init_state(k_state, states, params)

    from beluga_tpu.filters.builders import _exact_tail_slots

    s_tail = _exact_tail_slots(N, TILE, 0.125)
    assert s_tail > 0  # the hybrid tail is active at this config

    step = jax.jit(functools.partial(update, params, models, ctx))
    # the gate the filter's fast path sees: prefix slots only (the stray
    # tail is scored exactly, builders.make_windowed_scan_filter)
    gate = jax.jit(
        lambda s, cx, cy, ct: windowed_coverage_tiled_from_center(
            ctx["field"],
            jax.tree_util.tree_map(lambda l: l[: N - s_tail], s),
            cx, cy, ct, tile=TILE, tblk=TBLK,
            resolution_hint=grid.resolution_hint, dth=2.0 * np.pi / 128.0,
            **GEO,
        )
    )

    key = jax.random.PRNGKey(7)
    covs, errors, valids = [], [], []
    for t, (x, y, yaw) in enumerate(traj):
        if t in BURSTS:
            # forced recovery burst: scatter 25% of the cloud uniformly
            # over free space (kidnapped-tail regime), slots NOT re-sorted
            key, kb, km = jax.random.split(key, 3)
            randoms = sample_uniform_free_cells(
                kb, N, grid.free_xy, grid.num_free
            )
            mask = jax.random.bernoulli(km, 0.25, (N,))
            from beluga_tpu.core.particles import tree_where

            burst_states = tree_where(
                mask, randoms, state.particles.state
            )
            state = state._replace(
                particles=state.particles.replace(state=burst_states),
                force_update=jnp.asarray(True),
            )
        # the gate value the fast path would see (pre-update cloud)
        st = state.particles.state
        cx = jnp.mean(st.xy[..., 0])
        cy = jnp.mean(st.xy[..., 1])
        ct = jnp.arctan2(jnp.mean(st.rot.sin), jnp.mean(st.rot.cos))
        covs.append(float(gate(st, cx, cy, ct)))

        pts, mask_b = sim.scan(SE2.from_xytheta(x, y, yaw), noise_sigma=0.01)
        state, est = step(state, SE2.from_xytheta(x, y, yaw), pts, mask_b)
        valids.append(bool(est.valid))
        err_pos = np.hypot(float(est.pose.x) - x, float(est.pose.y) - y)
        err_yaw = abs(np.arctan2(
            np.sin(float(est.pose.theta) - yaw),
            np.cos(float(est.pose.theta) - yaw),
        ))
        errors.append((err_pos, err_yaw))

    covs = np.asarray(covs)
    # each burst must trip the coverage gate onto the exact path...
    for b in BURSTS:
        assert covs[b] < THRESH, (b, covs[b])
    # ...and the fast path must re-engage within 6 updates
    for b in BURSTS:
        assert np.any(covs[b : b + 7] >= THRESH), covs[b : b + 7]
    # steady state rides the fast path
    assert np.all(covs[-8:] >= THRESH), covs[-8:]

    # accuracy gate (test_system.cpp:133-134) on every valid update except
    # a short re-convergence window after each burst
    skip = set()
    for b in BURSTS:
        skip.update(range(b, b + 4))
    checked = 0
    for t, ((ep, ey), v) in enumerate(zip(errors, valids)):
        if not v or t in skip:
            continue
        checked += 1
        assert ep <= ERROR_POS_GATE, f"pos error {ep:.3f} m at step {t}"
        assert ey <= ERROR_YAW_GATE, f"yaw error {np.rad2deg(ey):.1f} deg at step {t}"
    assert checked >= 20


def test_winlut_selective_resampling_recovery(world):
    """Recovery burst with selective resampling + sorted slots (the r4
    bench regime, gated config): the theta sort now runs on its own
    schedule outside the resample branch — without that, slot order
    decays while ESS stays high and the slab overflows (measured
    divergence, NOTES r4).  The filter must recover from a 25% uniform
    scatter and track within the reference gates."""
    grid, models, ctx, sim = world
    params = AmclParams(
        max_particles=N, min_particles=N, sorted_slots=True,
        update_min_d=0.0, update_min_a=0.0,
        selective_resampling=True,
        # recovery machinery active so the burst is culled by resampling
        alpha_slow=0.001, alpha_fast=0.1,
    )
    traj = drive_trajectory(grid, start_xy=(-1.7, 0.5), num_steps=48, seed=6)
    k_init, k_state = jax.random.split(jax.random.PRNGKey(2))
    states = sample_normal_se2(
        k_init, N, SE2.from_xytheta(*traj[0]),
        jnp.diag(jnp.asarray([0.1, 0.1, 0.05])),
    )
    from beluga_tpu.core.particles import tree_take, tree_where

    states = tree_take(states, jnp.argsort(states.theta))
    state = init_state(k_state, states, params)
    step = jax.jit(functools.partial(update, params, models, ctx))

    key = jax.random.PRNGKey(11)
    burst_at = 20
    errors = []
    for t, (x, y, yaw) in enumerate(traj):
        if t == burst_at:
            key, kb, km = jax.random.split(key, 3)
            randoms = sample_uniform_free_cells(
                kb, N, grid.free_xy, grid.num_free
            )
            mask = jax.random.bernoulli(km, 0.25, (N,))
            state = state._replace(
                particles=state.particles.replace(
                    state=tree_where(mask, randoms, state.particles.state)
                ),
                force_update=jnp.asarray(True),
            )
        pts, mask_b = sim.scan(SE2.from_xytheta(x, y, yaw), noise_sigma=0.01)
        state, est = step(state, SE2.from_xytheta(x, y, yaw), pts, mask_b)
        if bool(est.valid):
            errors.append((t, np.hypot(float(est.pose.x) - x,
                                       float(est.pose.y) - y)))

    # tracks before the burst, recovers within 6 updates, tracks after
    pre = [e for t, e in errors if t < burst_at]
    post = [e for t, e in errors if t >= burst_at + 6]
    assert pre and max(pre) <= ERROR_POS_GATE
    assert post and max(post) <= ERROR_POS_GATE, max(post)
