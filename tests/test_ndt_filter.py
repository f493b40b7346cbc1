"""End-to-end NDT AMCL filter tests (2D and 3D) on the reference NDT maps."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.core.random import sample_normal_se2, sample_normal_se3
from beluga_tpu.filters.amcl import AmclParams, init_state, update
from beluga_tpu.filters.ndt_builders import make_ndt_filter_2d, make_ndt_filter_3d
from beluga_tpu.lie import SE2, SE3, SO3
from beluga_tpu.maps.ndt import load_ndt_hdf5

TURTLEBOT_NDT = "/root/reference/beluga/test/beluga/test_data/turtlebot3_world.hdf5"
SAMPLE_3D_NDT = "/root/reference/beluga/test/beluga/test_data/sample_3d_ndt_map.hdf5"


def sample_scan_from_map(ndt_map, rng, num_points=60, sigma=0.05, k_cells=6):
    """Synthesize a measurement: noisy points around a few map cell means,
    expressed in the world frame (robot at identity observes them as-is)."""
    n = int(ndt_map.num_cells)
    sel = rng.choice(n, size=min(k_cells, n), replace=False)
    means = np.asarray(ndt_map.means)[sel]
    pts = means[rng.integers(0, len(means), num_points)] + rng.normal(
        0, sigma, (num_points, means.shape[1])
    )
    return jnp.asarray(pts, jnp.float32), jnp.ones(num_points, bool)


class TestNdtFilter2d:
    def test_update_runs_and_prefers_truth(self):
        ndt_map = load_ndt_hdf5(TURTLEBOT_NDT)
        models, ctx = make_ndt_filter_2d(ndt_map)
        params = AmclParams(max_particles=300, min_particles=60)

        rng = np.random.default_rng(0)
        pts, mask = sample_scan_from_map(ndt_map, rng)

        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        states = sample_normal_se2(k1, 300, SE2.identity(), jnp.eye(3) * 0.3)
        state = init_state(k2, states, params)
        step = jax.jit(functools.partial(update, params, models))

        est = None
        for i in range(5):
            state = state._replace(force_update=jnp.asarray(True))
            state, est = update(params, models, ctx, state, SE2.identity(), pts, mask)
        assert bool(est.valid)
        # robot is at identity; the filter should stay near it
        assert np.hypot(float(est.pose.x), float(est.pose.y)) < 0.5
        assert np.isfinite(np.asarray(est.covariance)[:2, :2]).all()

    def test_recovery_generator_estimate_based(self):
        # with alpha_fast >> 1 every resample injects estimate-Gaussian
        # particles; the filter must stay finite and bounded
        ndt_map = load_ndt_hdf5(TURTLEBOT_NDT)
        models, ctx = make_ndt_filter_2d(ndt_map)
        params = AmclParams(
            max_particles=200, min_particles=50, alpha_slow=0.0, alpha_fast=100.0
        )
        rng = np.random.default_rng(2)
        pts, mask = sample_scan_from_map(ndt_map, rng)
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        states = sample_normal_se2(k1, 200, SE2.identity(), jnp.eye(3) * 0.2)
        state = init_state(k2, states, params)
        for _ in range(6):
            state = state._replace(force_update=jnp.asarray(True))
            state, est = update(params, models, ctx, state, SE2.identity(), pts, mask)
            assert np.isfinite(np.asarray(est.pose.xy)).all()
            assert 50 <= int(state.particles.active) <= 200


class TestNdtFilter3d:
    def test_update_runs_3d(self):
        ndt_map = load_ndt_hdf5(SAMPLE_3D_NDT)
        models, ctx = make_ndt_filter_3d(ndt_map)
        params = AmclParams(max_particles=200, min_particles=50)

        rng = np.random.default_rng(4)
        pts, mask = sample_scan_from_map(ndt_map, rng, num_points=80)

        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        states = sample_normal_se3(k1, 200, SE3.identity(), jnp.eye(6) * 0.05)
        state = init_state(k2, states, params, odom_identity=SE3.identity())

        est = None
        for _ in range(4):
            state = state._replace(force_update=jnp.asarray(True))
            state, est = update(
                params, models, ctx, state, SE3.identity(), pts, mask
            )
        assert bool(est.valid)
        assert np.isfinite(np.asarray(est.pose.xyz)).all()
        assert np.asarray(est.covariance).shape == (6, 6)
        assert np.linalg.norm(np.asarray(est.pose.xyz)) < 1.0

    def test_se3_motion_gating(self):
        ndt_map = load_ndt_hdf5(SAMPLE_3D_NDT)
        models, ctx = make_ndt_filter_3d(ndt_map)
        params = AmclParams(max_particles=100, min_particles=25)
        rng = np.random.default_rng(6)
        pts, mask = sample_scan_from_map(ndt_map, rng, num_points=40)
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        states = sample_normal_se3(k1, 100, SE3.identity(), jnp.eye(6) * 0.05)
        state = init_state(k2, states, params, odom_identity=SE3.identity())

        state, est = update(params, models, ctx, state, SE3.identity(), pts, mask)
        assert bool(est.valid)  # forced by initialization
        state, est = update(params, models, ctx, state, SE3.identity(), pts, mask)
        assert not bool(est.valid)  # no motion
        moved = SE3(jnp.asarray([0.5, 0.0, 0.0]), SO3.identity())
        state, est = update(params, models, ctx, state, moved, pts, mask)
        assert bool(est.valid)


def test_ndt_fleet_update_bounded_memory():
    """Fleets vmap the NDT reweight; the particle-chunked probe keeps the
    [B, N, C, K] intermediates workspace-bounded (regression: the
    unchunked form OOMed at fleet scale)."""
    import numpy as np

    from beluga_tpu.core.random import sample_normal_se2
    from beluga_tpu.filters.amcl import AmclParams, init_state
    from beluga_tpu.filters.ndt_builders import make_ndt_filter_2d
    from beluga_tpu.maps.ndt import load_ndt_hdf5
    from beluga_tpu.parallel.fleet import make_fleet_update

    nm = load_ndt_hdf5(
        "/root/reference/beluga/test/beluga/test_data/turtlebot3_world.hdf5")
    models, ctx = make_ndt_filter_2d(nm)
    b, n, p = 4, 1024, 24
    params = AmclParams(max_particles=n, min_particles=n)
    rng = np.random.default_rng(0)
    true = (-1.7, 0.5, 0.2)
    mu = np.asarray(nm.means)
    near = np.isfinite(mu).all(1) & (
        np.linalg.norm(mu - np.asarray(true[:2]), axis=1) < 3.0)
    sel = mu[near][rng.integers(0, near.sum(), p)]
    cy, sy = np.cos(true[2]), np.sin(true[2])
    local = (sel - np.asarray(true[:2])) @ np.array([[cy, -sy], [sy, cy]])
    pts = jnp.asarray(np.broadcast_to(
        (local + rng.normal(0, 0.01, local.shape)).astype(np.float32),
        (b, p, 2)))
    mask = jnp.ones((b, p), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), b)

    def one(key):
        k1, k2 = jax.random.split(key)
        st = sample_normal_se2(
            k1, n, SE2.from_xytheta(*true),
            jnp.diag(jnp.asarray([0.05, 0.05, 0.02], jnp.float32)))
        return init_state(k2, st, params)

    state = jax.vmap(one)(keys)
    odom = SE2.from_xytheta(jnp.full((b,), true[0]), jnp.full((b,), true[1]),
                            jnp.full((b,), true[2]))
    fstep = jax.jit(make_fleet_update(params, models))
    for _ in range(3):
        state = state._replace(force_update=jnp.ones(b, bool))
        state, est = fstep(ctx, state, odom, pts, mask)
    err = np.hypot(np.asarray(est.pose.x) - true[0],
                   np.asarray(est.pose.y) - true[1])
    assert err.max() < 0.3, err
    assert np.isfinite(np.asarray(state.particles.log_weight)).all()
