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


def _winlut_world(grid, **kw):
    """Flagship-config models: windowed scan LUT, gate-free hybrid, sized
    for the small test map (the BENCH headline configuration's structure)."""
    from beluga_tpu.filters.builders import make_windowed_scan_filter

    return make_windowed_scan_filter(
        grid, k_bins=32, win=(32, 128), max_point_radius=6.5, tile=128,
        tblk=12, coverage_threshold=0.0, exact_tail_frac=0.0,
        recovery_candidates=64, **kw,
    )


def _sorted_states(key, n, pose, cov):
    from beluga_tpu.core.particles import tree_take

    states = sample_normal_se2(key, n, pose, cov)
    return tree_take(states, jnp.argsort(states.theta))


def test_mega_flagship_winlut_sorted_slots_tracks(world, mesh):
    """The BENCH headline configuration — FUSED forward kernel (one
    Pallas pass: propagate + coords + winlut + log) + sorted_slots +
    sort_interval + bounded recovery pool + selective resampling — runs
    SHARDED (shard-local theta sort, VERDICT r4 #1) and tracks."""
    grid, _, _ = world
    models, ctx = _winlut_world(grid, fused=True)
    params = AmclParams(
        max_particles=1024, min_particles=1024, sorted_slots=True,
        resampling="systematic", recovery_pool=64,
        selective_resampling=True, sort_interval=2,
    )
    true_pose = (4.8, 4.8, 0.3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    states = _sorted_states(
        k1, 1024, SE2.from_xytheta(*true_pose), jnp.eye(3) * 0.05
    )
    state = shard_mega_state(mesh, init_state(k2, states, params))
    pts, mask = simulate_scan(grid, true_pose)
    import functools

    mega = jax.jit(
        functools.partial(make_mega_update(params, models, mesh)),
        static_argnames=("sort_now",),
    )
    for i in range(6):
        state = state._replace(force_update=jnp.asarray(True))
        state, est = mega(ctx, state, SE2.identity(), pts, mask,
                          sort_now=(i % 2 == 0))
    assert bool(est.valid)
    err = np.hypot(
        float(est.pose.x) - true_pose[0], float(est.pose.y) - true_pose[1]
    )
    assert err < 0.3, f"sharded flagship drifted: {err}"
    assert np.isfinite(np.asarray(state.particles.log_weight)).all()


def test_mega_flagship_tracks_single_device_run(world):
    """2-virtual-device sharded flagship numerically tracks the dense
    single-device run of the same configuration (VERDICT r4 #1 'done'
    criterion).  Propagate noise is removed so the only differences are
    shard-local window centers and sort order — both statistically
    irrelevant; estimates must agree to well under a cell."""
    grid, _, _ = world
    models, ctx = _winlut_world(grid)
    models = models._replace(propagate=lambda c, k, s, o, p: s)
    params = AmclParams(
        max_particles=512, min_particles=512, sorted_slots=True,
        resampling="systematic", recovery_pool=32,
        selective_resampling=True, sort_interval=2,
        alpha_slow=0.0, alpha_fast=0.0,  # p_random = 0: no injection noise
    )
    true_pose = (4.8, 4.8, 0.3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    states = _sorted_states(
        k1, 512, SE2.from_xytheta(*true_pose), jnp.eye(3) * 0.04
    )
    pts, mask = simulate_scan(grid, true_pose)
    import functools

    dense_step = jax.jit(
        functools.partial(update, params, models),
        static_argnames=("sort_now",),
    )
    mesh2 = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("tp",))
    mega = jax.jit(
        functools.partial(make_mega_update(params, models, mesh2)),
        static_argnames=("sort_now",),
    )
    dstate = init_state(k2, states, params)
    mstate = shard_mega_state(mesh2, init_state(k2, states, params))
    for i in range(4):
        sort_now = i % 2 == 0
        dstate = dstate._replace(force_update=jnp.asarray(True))
        dstate, dest = dense_step(
            ctx, dstate, SE2.identity(), pts, mask, sort_now=sort_now
        )
        mstate = mstate._replace(force_update=jnp.asarray(True))
        mstate, mest = mega(
            ctx, mstate, SE2.identity(), pts, mask, sort_now=sort_now
        )
        dx = abs(float(dest.pose.x) - float(mest.pose.x))
        dy = abs(float(dest.pose.y) - float(mest.pose.y))
        assert dx < 0.05 and dy < 0.05, (
            f"step {i}: sharded diverged from dense by ({dx:.4f}, {dy:.4f})"
        )


def test_mega_flagship_recovery_burst(world, mesh):
    """Forced injection through the sharded bounded pool (recovery_pool
    split across shards) stays finite and keeps the sorted-slot invariant
    usable (selective resampling + shard-local sort)."""
    grid, _, _ = world
    models, ctx = _winlut_world(grid)
    params = AmclParams(
        max_particles=1024, min_particles=1024, sorted_slots=True,
        resampling="systematic", recovery_pool=128,
        selective_resampling=True, sort_interval=2,
        alpha_slow=0.9, alpha_fast=0.01,  # forces p_random > 0
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(17))
    states = _sorted_states(
        k1, 1024, SE2.from_xytheta(4.8, 4.8, 0.0), jnp.eye(3) * 0.05
    )
    state = shard_mega_state(mesh, init_state(k2, states, params))
    pts, mask = simulate_scan(grid, (2.0, 7.0, 1.0))  # mismatched scan
    import functools

    mega = jax.jit(
        functools.partial(make_mega_update(params, models, mesh)),
        static_argnames=("sort_now",),
    )
    for i in range(6):
        state = state._replace(force_update=jnp.asarray(True))
        state, est = mega(ctx, state, SE2.identity(), pts, mask,
                          sort_now=(i % 2 == 0))
        assert np.isfinite(np.asarray(state.particles.log_weight)).all()
        assert np.isfinite(np.asarray(state.particles.state.xy)).all()


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
