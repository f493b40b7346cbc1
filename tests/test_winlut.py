"""Windowed shared-scan pose LUT: accuracy vs the exact per-beam model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.models.sensor.likelihood_field import (
    LikelihoodFieldParams,
    likelihood_field_weights,
    make_likelihood_field,
)
from beluga_tpu.models.sensor.likelihood_field_winlut import (
    build_windowed_scan_lut,
    windowed_coverage,
    windowed_scan_lut_weights,
)

CENTER = (3.2, 3.2, 0.7)


@pytest.fixture(scope="module")
def setup():
    data = np.zeros((64, 64), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[25:30, 40:45] = OCCUPIED_VALUE
    data[45:48, 12:18] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)
    field = make_likelihood_field(LikelihoodFieldParams(max_laser_distance=5.0), grid)

    rng = np.random.default_rng(0)
    n_beams = 24
    angles = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    r = rng.uniform(0.5, 2.0, n_beams)
    points = jnp.asarray(np.stack([r * np.cos(angles), r * np.sin(angles)], -1), jnp.float32)
    mask = jnp.ones(n_beams, bool)
    lut = jax.jit(
        lambda f, p, m: build_windowed_scan_lut(
            f, p, m, *map(jnp.float32, CENTER),
            k_bins=32, win=64, dth=2.0 * np.pi / 128.0,
            max_point_radius=2.5, resolution_hint=0.1,
        )
    )(field, points, mask)
    return field, points, mask, lut


def _cloud_states(n, spread_xy=0.4, spread_th=0.25, seed=1, sort=True):
    rng = np.random.default_rng(seed)
    th = CENTER[2] + rng.uniform(-spread_th, spread_th, n)
    if sort:  # θ-sorted slots: the kernel's tile/slab contract
        th = np.sort(th)
    return SE2.from_xytheta(
        jnp.asarray(CENTER[0] + rng.uniform(-spread_xy, spread_xy, n), jnp.float32),
        jnp.asarray(CENTER[1] + rng.uniform(-spread_xy, spread_xy, n), jnp.float32),
        jnp.asarray(th, jnp.float32),
    )


def test_winlut_matches_exact_model(setup):
    field, points, mask, lut = setup
    states = _cloud_states(512)
    exact = np.asarray(likelihood_field_weights(field, states, points, mask))
    approx = np.asarray(
        windowed_scan_lut_weights(lut, states, tile=128, interpret=True)
    )

    rel = np.abs(approx - exact) / np.abs(exact)
    assert np.median(rel) < 0.08, f"median rel err {np.median(rel):.3f}"
    assert np.corrcoef(exact, approx)[0, 1] > 0.9
    k = len(exact) // 10
    overlap = len(set(np.argsort(exact)[-k:]) & set(np.argsort(approx)[-k:])) / k
    assert overlap > 0.6, f"top-decile overlap {overlap:.2f}"


def test_winlut_strays_score_miss(setup):
    field, points, mask, _ = setup
    # a 32-cell window (3.2 m) leaves real out-of-window space on the 6.4 m
    # map: far outside in x/y, and in-window xy but out-of-range theta
    lut = build_windowed_scan_lut(
        field, points, mask, *map(jnp.float32, CENTER),
        k_bins=32, win=32, dth=2.0 * np.pi / 128.0,
        max_point_radius=2.5, resolution_hint=0.1,
    )
    states = SE2.from_xytheta(
        jnp.asarray([0.3, 5.9, CENTER[0]], jnp.float32),
        jnp.asarray([0.3, 5.9, CENTER[1]], jnp.float32),
        jnp.asarray([CENTER[2], CENTER[2], CENTER[2] + np.pi], jnp.float32),
    )
    w = np.asarray(windowed_scan_lut_weights(lut, states, interpret=True))
    miss = float(lut.miss)
    np.testing.assert_allclose(w, miss, rtol=1e-6)
    assert np.isfinite(w).all() and (w >= 1.0).all()


def test_winlut_coverage_gate(setup):
    field, points, mask, lut = setup
    inside = _cloud_states(256)
    cov_in = float(windowed_coverage(lut, inside, stride=1))
    assert cov_in > 0.95
    rng = np.random.default_rng(3)
    outside = SE2.from_xytheta(
        jnp.asarray(rng.uniform(0.2, 6.0, 256), jnp.float32),
        jnp.asarray(rng.uniform(0.2, 6.0, 256), jnp.float32),
        jnp.asarray(rng.uniform(-np.pi, np.pi, 256), jnp.float32),
    )
    cov_out = float(windowed_coverage(lut, outside, stride=1))
    assert cov_out < 0.6


def test_windowed_scan_filter_tracks_and_falls_back(setup):
    """make_windowed_scan_filter: converged clouds ride the winlut path and
    track; a diverged cloud trips the coverage gate onto the exact path
    (bit-identical to the plain likelihood-field reweight)."""
    from beluga_tpu.core.random import sample_normal_se2, sample_uniform_box_se2
    from beluga_tpu.filters.amcl import AmclParams, init_state, update
    from beluga_tpu.filters.builders import (
        make_likelihood_field_filter,
        make_windowed_scan_filter,
    )

    field, points, mask, _ = setup
    data = np.zeros((64, 64), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[25:30, 40:45] = OCCUPIED_VALUE
    data[45:48, 12:18] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)
    lfp = LikelihoodFieldParams(max_laser_distance=5.0)
    models, ctx = make_windowed_scan_filter(
        grid, lfp, k_bins=32, win=48, max_point_radius=2.5,
        tile=128, coverage_threshold=0.95,
    )
    n = 256
    params = AmclParams(
        max_particles=n, min_particles=n, sorted_slots=True,
        update_min_d=0.0, update_min_a=0.0,
    )
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    states = sample_normal_se2(
        k1, n, SE2.from_xytheta(*CENTER),
        jnp.diag(jnp.asarray([0.01, 0.01, 0.01], jnp.float32)),
    )
    st = init_state(k2, states, params)
    odom = SE2.from_xytheta(*map(jnp.float32, CENTER))
    for _ in range(3):
        st, est = update(params, models, ctx, st, odom, points, mask)
    err = np.hypot(
        float(est.pose.xy[0]) - CENTER[0], float(est.pose.xy[1]) - CENTER[1]
    )
    assert err < 0.35, err

    # diverged cloud -> coverage gate -> exact fallback (bit-identical)
    k3, k4 = jax.random.split(k2)
    wide = sample_uniform_box_se2(
        k3, n, jnp.asarray([0.5, 0.5], jnp.float32),
        jnp.asarray([5.9, 5.9], jnp.float32),
    )
    lw = models.log_weight(ctx, wide, points, mask)
    exact = np.log(
        np.asarray(likelihood_field_weights(ctx["field"], wide, points, mask))
    )
    np.testing.assert_allclose(np.asarray(lw), exact, rtol=1e-6)


def test_winlut_small_map_padding(setup):
    """Maps smaller than the window still build and evaluate (pad growth)."""
    _, points, mask, _ = setup
    data = np.zeros((20, 20), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)
    field = make_likelihood_field(LikelihoodFieldParams(max_laser_distance=5.0), grid)
    lut = build_windowed_scan_lut(
        field, points, mask,
        jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.0),
        k_bins=16, win=64, max_point_radius=2.5, resolution_hint=0.1,
    )
    states = SE2.from_xytheta(
        jnp.asarray([1.0], jnp.float32), jnp.asarray([1.0], jnp.float32),
        jnp.asarray([0.0], jnp.float32),
    )
    exact = np.asarray(likelihood_field_weights(field, states, points, mask))
    approx = np.asarray(windowed_scan_lut_weights(lut, states, interpret=True))
    assert np.isfinite(approx).all()
    # a 2 m map puts EVERY beam endpoint on a wall/unknown discontinuity —
    # the sinc-sampling worst case — so only a loose band is asserted here
    # (a misindexing bug would return miss≈1.19 or garbage, not a value in
    # the exact neighborhood); accuracy is covered on the larger-map test
    assert approx[0] > 1.5 * float(lut.miss)
    np.testing.assert_allclose(approx, exact, rtol=0.5)


def test_tiled_coverage_models_theta_slab(setup):
    """coverage_tiled_from_coords mirrors the kernel's per-tile θ-slab
    (advisor r2): an unsorted cloud spanning more bins than tblk-1 per
    tile fails the gate even though every particle is inside the window,
    while the same cloud θ-sorted passes — and the gate's verdict matches
    what the kernel actually scores."""
    from beluga_tpu.models.sensor.likelihood_field_winlut import (
        windowed_coverage_tiled_from_center,
    )

    field, points, mask, lut = setup
    geo = dict(
        k_bins=32, win=64, dth=2.0 * np.pi / 128.0, max_point_radius=2.5,
        resolution_hint=0.1,
    )
    cx, cy, ct = map(jnp.float32, CENTER)
    # wide-but-in-window θ spread: 32 bins * dth/2 span, shuffled slots
    unsorted = _cloud_states(512, spread_xy=0.3, spread_th=0.55, sort=False)
    cov_unsorted = float(windowed_coverage_tiled_from_center(
        field, unsorted, cx, cy, ct, tile=128, tblk=8, **geo))
    sorted_states = _cloud_states(512, spread_xy=0.3, spread_th=0.55, sort=True)
    cov_sorted = float(windowed_coverage_tiled_from_center(
        field, sorted_states, cx, cy, ct, tile=128, tblk=8, **geo))
    assert cov_unsorted < 0.6, cov_unsorted
    assert cov_sorted > 0.95, cov_sorted

    # the gate's per-particle verdict equals the kernel's: unsorted slots
    # make the kernel score miss for exactly the particles the gate drops
    w = np.asarray(
        windowed_scan_lut_weights(lut, unsorted, tile=128, tblk=8, interpret=True)
    )
    frac_scored = np.mean(w != float(lut.miss))
    assert abs(frac_scored - cov_unsorted) < 0.02, (frac_scored, cov_unsorted)


def test_winlut_int8_table_close_to_bf16(setup):
    """int8-quantized window tables (per-build scale) track the bf16
    values to ~1% relative (table quant 0.4% + one-hot lerp quant 0.4%).
    Note: int8 measured SLOWER than bf16 on v5e for this kernel
    (benchmarks/NOTES r5) — the path exists for VMEM-constrained tables."""
    field, points, mask, lut16 = setup
    lut8 = build_windowed_scan_lut(
        field, points, mask, *map(jnp.float32, CENTER),
        k_bins=32, win=64, dth=2.0 * np.pi / 128.0,
        max_point_radius=2.5, resolution_hint=0.1, table_dtype="int8",
    )
    assert lut8.values_t.dtype == jnp.int8
    states = _cloud_states(512)
    w16 = np.asarray(
        windowed_scan_lut_weights(lut16, states, tile=128, tblk=8, interpret=True)
    )
    w8 = np.asarray(
        windowed_scan_lut_weights(lut8, states, tile=128, tblk=8, interpret=True)
    )
    rel = np.abs(w8 - w16) / np.maximum(np.abs(w16), 1e-6)
    assert rel.mean() < 0.01, rel.mean()
    assert rel.max() < 0.05, rel.max()


def test_fused_step_matches_unfused(setup):
    """The fused propagate+coords+winlut+log kernel
    (ops/pallas_fused_step.py) reproduces the separate propagate +
    log_weight chain: identical normal draws -> bit-close states, and
    log-likelihoods equal up to the predicted-vs-propagated window-center
    quantization (well under the bf16 table granularity here)."""
    from beluga_tpu.filters.builders import make_windowed_scan_filter
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE as OCC, make_grid as mk

    data = np.zeros((64, 64), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCC
    data[25:30, 40:45] = OCC
    grid = mk(data, 0.1)
    kw = dict(k_bins=32, win=(32, 128), max_point_radius=6.5, tile=128,
              tblk=12, coverage_threshold=0.0, exact_tail_frac=0.0)
    models_u, ctx = make_windowed_scan_filter(grid, **kw)
    models_f, _ = make_windowed_scan_filter(grid, fused=True, **kw)
    _, points, mask, _ = setup
    states = _cloud_states(512)
    pose = SE2.from_xytheta(*CENTER)
    k = jax.random.PRNGKey(3)
    ns_u = models_u.propagate(ctx, k, states, pose, pose)
    ll_u = models_u.log_weight(ctx, ns_u, points, mask)
    ns_f, ll_f = models_f.fused_propagate_reweight(
        ctx, k, states, pose, pose, points, mask
    )
    np.testing.assert_allclose(
        np.asarray(ns_u.x), np.asarray(ns_f.x), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ns_u.rot.z), np.asarray(ns_f.rot.z), atol=1e-5
    )
    dll = np.abs(np.asarray(ll_u) - np.asarray(ll_f))
    assert dll.max() < 1e-3, dll.max()


def test_fused_step_coverage_gate_falls_back(setup):
    """With a coverage threshold, the fused path gates on the PREDICTED
    cloud and falls back to exact propagate + reweight when the cloud
    does not fit the kernel's window contract."""
    from beluga_tpu.filters.builders import make_windowed_scan_filter
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE as OCC, make_grid as mk

    data = np.zeros((64, 64), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCC
    grid = mk(data, 0.1)
    kw = dict(k_bins=32, win=(32, 128), max_point_radius=6.5, tile=128,
              tblk=12, exact_tail_frac=0.0)
    models_f, ctx = make_windowed_scan_filter(
        grid, fused=True, coverage_threshold=0.95, **kw
    )
    _, points, mask, _ = setup
    pose = SE2.from_xytheta(*CENTER)
    k = jax.random.PRNGKey(4)
    # scattered cloud (uniform over the map, unsorted): gate must trip the
    # exact fallback -> no particle scores the winlut miss weight
    rng = np.random.default_rng(9)
    scattered = SE2.from_xytheta(
        jnp.asarray(rng.uniform(0.5, 5.9, 256), jnp.float32),
        jnp.asarray(rng.uniform(0.5, 5.9, 256), jnp.float32),
        jnp.asarray(rng.uniform(-np.pi, np.pi, 256), jnp.float32),
    )
    ns, ll = models_f.fused_propagate_reweight(
        ctx, k, scattered, pose, pose, points, mask
    )
    assert np.isfinite(np.asarray(ll)).all()
    # exact weights have full spread; a winlut miss plateau would collapse
    # most values to one constant
    vals, counts = np.unique(np.round(np.asarray(ll), 5), return_counts=True)
    assert counts.max() < 128, "fallback did not engage (miss plateau)"


def test_fused_filter_tracks_with_rbg_keys(setup):
    """The full fused-flagship update runs with an ``rbg``-typed PRNG key
    (the bench primary switches ``jax_default_prng_impl`` to rbg — a
    measured 0.3 ms/step saving over threefry at 2M; NOTES r5 session 2).
    RNG parity is statistical (SURVEY.md §7.3): the filter must track the
    same world with either implementation."""
    from beluga_tpu.filters.amcl import AmclParams, init_state, update
    from beluga_tpu.filters.builders import make_windowed_scan_filter
    from beluga_tpu.io.replay import ScanSimulator, ScanSpec
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE as OCC, make_grid as mk
    import functools

    data = np.zeros((64, 64), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCC
    data[25:30, 40:45] = OCC
    data[45:48, 12:18] = OCC
    grid = mk(data, 0.1)
    models, ctx = make_windowed_scan_filter(
        grid, k_bins=32, win=(32, 128), max_point_radius=6.5, tile=128,
        tblk=12, coverage_threshold=0.0, exact_tail_frac=0.0, fused=True,
        recovery_candidates=64,
    )
    params = AmclParams(
        max_particles=512, min_particles=512, sorted_slots=True,
        resampling="systematic", recovery_pool=16,
        selective_resampling=True, sort_interval=2,
        update_min_d=0.0, update_min_a=0.0,
    )
    from beluga_tpu.core.random import sample_normal_se2

    key = jax.random.key(7, impl="rbg")
    k1, k2 = jax.random.split(key)
    pose = SE2.from_xytheta(*CENTER)
    states = sample_normal_se2(k1, 512, pose, jnp.eye(3) * 0.04)
    state = init_state(k2, states, params)
    sim = ScanSimulator(grid, ScanSpec(num_beams=24, max_beams=24))
    pts, mask = sim.scan(pose)
    step = jax.jit(functools.partial(update, params, models),
                   static_argnames=("sort_now",))
    for i in range(6):
        state = state._replace(force_update=jnp.asarray(True))
        state, est = step(ctx, state, SE2.identity(), pts, mask,
                          sort_now=(i % 2 == 0))
    assert np.isfinite(np.asarray(state.particles.log_weight)).all()
    err = np.hypot(float(est.pose.x) - CENTER[0],
                   float(est.pose.y) - CENTER[1])
    assert err < 0.3, f"rbg-keyed filter drifted: {err}"
