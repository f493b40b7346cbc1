"""Explicit shard_map mega-filter (parallel/mega.py) on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from beluga_tpu.core.random import sample_normal_se2
from beluga_tpu.filters.amcl import AmclParams, init_state, update
from beluga_tpu.filters.builders import make_likelihood_field_filter
from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.parallel.mega import make_mega_update, shard_mega_state


@pytest.fixture(scope="module")
def world():
    data = np.zeros((96, 96), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[40:46, 60:66] = OCCUPIED_VALUE
    data[20:24, 20:30] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)
    models, ctx = make_likelihood_field_filter(grid)
    return grid, models, ctx


def simulate_scan(grid, pose_xy_yaw, n_beams=24):
    from beluga_tpu.io.replay import ScanSimulator, ScanSpec

    sim = ScanSimulator(grid, ScanSpec(num_beams=n_beams, max_range=6.0,
                                       max_beams=n_beams))
    pose = SE2.from_xytheta(*pose_xy_yaw)
    dist, hit = sim._cast(pose)
    ang = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    pts = np.stack([np.asarray(dist) * np.cos(ang), np.asarray(dist) * np.sin(ang)], -1)
    return jnp.asarray(pts, jnp.float32), jnp.asarray(np.asarray(hit))


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("tp",))


def test_mega_update_tracks(world, mesh):
    grid, models, ctx = world
    params = AmclParams(max_particles=1024, min_particles=128)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    true_pose = (4.8, 4.8, 0.3)
    states = sample_normal_se2(
        k1, 1024, SE2.from_xytheta(*true_pose), jnp.eye(3) * 0.05
    )
    state = shard_mega_state(mesh, init_state(k2, states, params))
    pts, mask = simulate_scan(grid, true_pose)
    mega = jax.jit(make_mega_update(params, models, mesh))
    for _ in range(5):
        state = state._replace(force_update=jnp.asarray(True))
        state, est = mega(ctx, state, SE2.identity(), pts, mask)
    assert bool(est.valid)
    err = np.hypot(float(est.pose.x) - true_pose[0], float(est.pose.y) - true_pose[1])
    assert err < 0.5, f"mega filter drifted: {err}"
    assert np.isfinite(np.asarray(state.particles.log_weight)).all()
    assert 128 <= int(state.particles.active) <= 1024


def test_mega_estimate_matches_dense(world, mesh):
    """Deterministic pieces (normalize + estimate) agree with the dense path."""
    grid, models, ctx = world
    params = AmclParams(max_particles=1024, min_particles=128,
                        resample_interval=1000000)  # never resample
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    states = sample_normal_se2(k1, 1024, SE2.from_xytheta(4.8, 4.8, 0.0),
                               jnp.eye(3) * 0.05)
    pts, mask = simulate_scan(grid, (4.8, 4.8, 0.0))

    # propagate noise differs between paths (per-shard keys); remove it
    models_np = models._replace(propagate=lambda c, k, s, o, p: s)
    dense_state = init_state(k2, states, params)
    dense_state, dense_est = update(
        params, models_np, ctx, dense_state, SE2.identity(), pts, mask)

    mstate = shard_mega_state(mesh, init_state(k2, states, params))
    mega = jax.jit(make_mega_update(params, models_np, mesh))
    mstate, mest = mega(ctx, mstate, SE2.identity(), pts, mask)

    np.testing.assert_allclose(float(mest.pose.x), float(dense_est.pose.x), atol=1e-5)
    np.testing.assert_allclose(float(mest.pose.y), float(dense_est.pose.y), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mest.covariance)[:2, :2],
        np.asarray(dense_est.covariance)[:2, :2], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mstate.particles.log_weight),
        np.asarray(dense_state.particles.log_weight), atol=1e-4)


def test_mega_recovery_and_kld(world, mesh):
    grid, models, ctx = world
    params = AmclParams(max_particles=1024, min_particles=128,
                        alpha_slow=0.0, alpha_fast=100.0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    states = sample_normal_se2(k1, 1024, SE2.from_xytheta(4.8, 4.8, 0.0),
                               jnp.eye(3) * 0.05)
    state = shard_mega_state(mesh, init_state(k2, states, params))
    pts, mask = simulate_scan(grid, (2.0, 7.0, 1.0))  # mismatched scan
    mega = jax.jit(make_mega_update(params, models, mesh))
    for _ in range(6):
        state = state._replace(force_update=jnp.asarray(True))
        state, est = mega(ctx, state, SE2.identity(), pts, mask)
        assert np.isfinite(np.asarray(state.particles.log_weight)).all()
        assert 128 <= int(state.particles.active) <= 1024


def test_multihost_driver_single_process(capsys):
    """The pod driver runs end-to-end on the virtual single-process mesh."""
    import json as _json
    from beluga_tpu.parallel.multihost import build_pod_mesh, main

    mesh = build_pod_mesh(num_hosts=2)
    assert mesh.shape["dp"] == 2 and mesh.shape["tp"] == 4
    main(["--particles", "64", "--beams", "8", "--grid-size", "48",
          "--filters-per-device", "2"])
    out = capsys.readouterr().out.strip().splitlines()
    rows = [_json.loads(l) for l in out if l.startswith("{")]
    assert rows and rows[0]["devices"] == 1
    assert all(r["filters_per_s"] > 0 for r in rows)


@pytest.mark.parametrize(
    "strategy", ["multinomial", "stratified", "residual", "systematic"]
)
def test_mega_resampling_strategies_track(world, mesh, strategy):
    """All four strategies run sharded and keep tracking (parallel/mega.py
    strategy sweep; residual/multinomial/stratified are net-new r4)."""
    grid, models, ctx = world
    params = AmclParams(
        max_particles=1024, min_particles=128, resampling=strategy
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    true_pose = (4.8, 4.8, 0.3)
    states = sample_normal_se2(
        k1, 1024, SE2.from_xytheta(*true_pose), jnp.eye(3) * 0.05
    )
    state = shard_mega_state(mesh, init_state(k2, states, params))
    pts, mask = simulate_scan(grid, true_pose)
    mega = jax.jit(make_mega_update(params, models, mesh))
    for _ in range(4):
        state = state._replace(force_update=jnp.asarray(True))
        state, est = mega(ctx, state, SE2.identity(), pts, mask)
    assert bool(est.valid)
    err = np.hypot(
        float(est.pose.x) - true_pose[0], float(est.pose.y) - true_pose[1]
    )
    assert err < 0.5, f"{strategy}: err={err:.3f}"


def test_mega_residual_floor_copies(world, mesh):
    """Sharded residual resampling: every particle appears at least its
    deterministic floor(N w) count among the donors (exact global-rank
    construction over the all-gathered count CDF)."""
    grid, models, ctx = world
    n = 256
    params = AmclParams(
        max_particles=n, min_particles=n, resampling="residual",
        # zero recovery: isolate the resampler (no injected randoms)
        alpha_slow=0.0, alpha_fast=0.0,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    true_pose = (4.8, 4.8, 0.3)
    states = sample_normal_se2(
        k1, n, SE2.from_xytheta(*true_pose), jnp.eye(3) * 0.04
    )
    state = shard_mega_state(mesh, init_state(k2, states, params))
    pts, mask = simulate_scan(grid, true_pose)
    mega = jax.jit(make_mega_update(params, models, mesh))

    # one update: reweight + resample; donors must repeat the weighted
    # input states.  Recover donor identity by matching x coordinates of
    # the PROPAGATED states — motion is identity+noise, so propagate
    # changes states; instead run with a pure copy check: compare donor
    # multiset against the reweighted distribution's floor counts by
    # re-deriving weights from a second, resample-free run.
    params_nores = AmclParams(
        max_particles=n, min_particles=n, resampling="residual",
        resample_interval=1000000, alpha_slow=0.0, alpha_fast=0.0,
    )
    mega_nores = jax.jit(make_mega_update(params_nores, models, mesh))
    s1 = state._replace(force_update=jnp.asarray(True))
    s_no, _ = mega_nores(ctx, s1, SE2.identity(), pts, mask)
    # same key path: k_prop is split identically, so propagated states and
    # weights match between the two programs
    s_res, _ = mega(ctx, s1, SE2.identity(), pts, mask)

    w = np.asarray(jax.device_get(jnp.exp(s_no.particles.log_weight)))
    w = w / w.sum()
    counts = np.floor(w * n)
    xs_in = np.asarray(jax.device_get(s_no.particles.state.xy[:, 0]))
    xs_out = np.asarray(jax.device_get(s_res.particles.state.xy[:, 0]))
    # match donors to inputs by exact x coordinate (f32 copies are exact)
    for i in np.nonzero(counts > 0)[0]:
        got = np.sum(xs_out == xs_in[i])
        assert got >= counts[i], (
            f"particle {i}: {got} copies < floor count {counts[i]}"
        )
