"""Range-LUT beam model: LUT correctness and weight parity with the exact
ray-marched model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.models.sensor.beam import BeamModelParams, beam_weights
from beluga_tpu.models.sensor.beam_lut import beam_lut_weights, build_range_lut
from beluga_tpu.ops.raycast import cast_rays


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(0)
    data = np.zeros((48, 48), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[20:24, 30:34] = OCCUPIED_VALUE
    data[34:37, 10:13] = OCCUPIED_VALUE
    return make_grid(data, 0.1)


def test_lut_entries_match_direct_casts(world):
    lut = build_range_lut(world, max_range=4.0, n_bearings=32)
    assert lut.ranges.shape == (32, 48, 48)

    # spot-check: LUT entry == direct cast from the same cell center at the
    # same binned bearing (identical Bresenham, so exact)
    rng = np.random.default_rng(1)
    for _ in range(20):
        yi, xi = rng.integers(4, 44, 2)
        k = rng.integers(0, 32)
        theta = 2 * np.pi * k / 32
        src = jnp.asarray([[(xi + 0.5) * 0.1, (yi + 0.5) * 0.1]], jnp.float32)
        d = jnp.asarray([[np.cos(theta), np.sin(theta)]], jnp.float32)
        dist, hit = cast_rays(world, src, d, 4.0, resolution_hint=0.1)
        want = float(dist[0]) if bool(hit[0]) else 4.0
        got = float(lut.ranges[k, yi, xi])
        assert got == pytest.approx(want, abs=1e-5), (yi, xi, k)


def test_beam_weights_close_to_exact(world):
    params = BeamModelParams(
        z_hit=0.7, z_short=0.1, z_max=0.05, z_rand=0.15,
        sigma_hit=0.25, beam_max_range=4.0,
    )
    lut = build_range_lut(world, max_range=4.0, n_bearings=128)

    rng = np.random.default_rng(2)
    n_beams = 20
    angles = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    r = rng.uniform(0.4, 2.0, n_beams)
    points = jnp.asarray(np.stack([r * np.cos(angles), r * np.sin(angles)], -1), jnp.float32)
    mask = jnp.ones(n_beams, bool)

    n = 200
    states = SE2.from_xytheta(
        jnp.asarray(rng.uniform(0.8, 4.0, n), jnp.float32),
        jnp.asarray(rng.uniform(0.8, 4.0, n), jnp.float32),
        jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32),
    )
    exact = np.asarray(
        beam_weights(params, world, states, points, mask, resolution_hint=0.1)
    )
    approx = np.asarray(beam_lut_weights(params, lut, states, points, mask))

    # bearing quantization smooths z_mean; weights stay strongly correlated
    assert np.corrcoef(np.log(exact + 1e-9), np.log(approx + 1e-9))[0, 1] > 0.9
    k = n // 10
    overlap = len(set(np.argsort(exact)[-k:]) & set(np.argsort(approx)[-k:])) / k
    assert overlap >= 0.5


def test_lut_weights_finite_everywhere(world):
    params = BeamModelParams(beam_max_range=4.0)
    lut = build_range_lut(world, max_range=4.0, n_bearings=16)
    states = SE2.from_xytheta(
        jnp.asarray([-5.0, 2.0, 100.0]), jnp.asarray([2.0, 2.0, 100.0]), jnp.zeros(3)
    )
    pts = jnp.asarray([[1.0, 0.0], [0.0, 1.5]], jnp.float32)
    w = np.asarray(beam_lut_weights(params, lut, states, pts, jnp.ones(2, bool)))
    assert np.isfinite(w).all()


def test_beam_lut_filter_end_to_end(world):
    """Full AMCL loop with the range-LUT beam model tracks a pose."""
    import functools

    from beluga_tpu.core.random import sample_normal_se2
    from beluga_tpu.filters.amcl import AmclParams, init_state, update
    from beluga_tpu.filters.builders import make_beam_filter

    params_f = AmclParams(max_particles=300, min_particles=75)
    models, ctx = make_beam_filter(
        world, BeamModelParams(beam_max_range=4.0), use_range_lut=True, n_bearings=64
    )

    # simulate a scan from the true pose using direct casts
    rng = np.random.default_rng(3)
    true = (2.4, 2.4, 0.2)
    n_beams = 30
    bearings = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    src = jnp.broadcast_to(jnp.asarray([true[0], true[1]], jnp.float32), (n_beams, 2))
    dirs = jnp.stack(
        [jnp.cos(jnp.asarray(bearings + true[2], jnp.float32)),
         jnp.sin(jnp.asarray(bearings + true[2], jnp.float32))], -1
    )
    dist, hit = cast_rays(world, src, dirs, 4.0, resolution_hint=0.1)
    r = np.where(np.asarray(hit), np.asarray(dist), np.nan)
    pts = np.stack([r * np.cos(bearings), r * np.sin(bearings)], -1)
    mask = np.isfinite(r)
    pts = jnp.asarray(np.nan_to_num(pts), jnp.float32)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    states = sample_normal_se2(
        k1, 300, SE2.from_xytheta(*true), jnp.diag(jnp.asarray([0.1, 0.1, 0.05]))
    )
    state = init_state(k2, states, params_f)
    est = None
    for _ in range(4):
        state = state._replace(force_update=jnp.asarray(True))
        state, est = update(
            params_f, models, ctx, state, SE2.identity(), pts, jnp.asarray(mask)
        )
    assert bool(est.valid)
    err = np.hypot(float(est.pose.x) - true[0], float(est.pose.y) - true[1])
    assert err < 0.3, err


class TestSphereTraceBeam:
    """Opt-in sphere-tracing beam fast path (ops/pallas_beam.py)."""

    def _world(self):
        data = np.zeros((96, 96), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        data[40:46, 60:66] = OCCUPIED_VALUE
        data[20:24, 20:30] = OCCUPIED_VALUE
        return make_grid(data, 0.1)

    def test_weights_track_exact_model(self):
        from beluga_tpu.models.sensor.beam import (
            BeamModelParams, beam_sphere_trace_log_weights, beam_weights)
        from beluga_tpu.ops.pallas_beam import make_distance_cells

        grid = self._world()
        bp = BeamModelParams(beam_max_range=8.0)
        dist = make_distance_cells(grid.free_mask)
        rng = np.random.default_rng(0)
        n, b = 60, 16
        states = SE2.from_xytheta(
            jnp.asarray(rng.uniform(1.5, 8.0, n), jnp.float32),
            jnp.asarray(rng.uniform(1.5, 8.0, n), jnp.float32),
            jnp.asarray(rng.uniform(-3.14, 3.14, n), jnp.float32))
        ang = np.linspace(-np.pi, np.pi, b, endpoint=False)
        pts = jnp.asarray(
            np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang)], -1), jnp.float32)
        mask = jnp.ones(b, bool)
        we = np.asarray(beam_weights(bp, grid, states, pts, mask,
                                     resolution_hint=0.1))
        ws = np.asarray(jnp.exp(beam_sphere_trace_log_weights(
            bp, dist, grid, states, pts, mask, interpret=True)))
        # approximate contract: high rank agreement, bounded relative error
        rel = np.abs(ws - we) / np.maximum(we, 1e-6)
        assert np.median(rel) < 0.15
        # Spearman without scipy: correlation of rank vectors
        ra = np.argsort(np.argsort(we)).astype(np.float64)
        rb = np.argsort(np.argsort(ws)).astype(np.float64)
        rho = np.corrcoef(ra, rb)[0, 1]
        assert rho > 0.95, rho

    def test_filter_tracks_with_sphere_trace(self):
        from beluga_tpu.core.random import sample_normal_se2
        from beluga_tpu.filters.amcl import AmclParams, init_state, update
        from beluga_tpu.filters.builders import make_beam_filter
        from beluga_tpu.io.replay import ScanSimulator, ScanSpec

        grid = self._world()
        models, ctx = make_beam_filter(grid, use_sphere_trace=True)
        assert "beam_dist" in ctx
        params = AmclParams(max_particles=256, min_particles=64)
        true = (4.8, 4.8, 0.3)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        states = sample_normal_se2(
            k1, 256, SE2.from_xytheta(*true), jnp.eye(3) * 0.04)
        state = init_state(k2, states, params)
        sim = ScanSimulator(grid, ScanSpec(num_beams=16, max_range=6.0,
                                           max_beams=16))
        d, hit = sim._cast(SE2.from_xytheta(*true))
        ang = np.linspace(-np.pi, np.pi, 16, endpoint=False)
        pts = jnp.asarray(np.stack([np.asarray(d) * np.cos(ang),
                                    np.asarray(d) * np.sin(ang)], -1), jnp.float32)
        mask = jnp.asarray(np.asarray(hit))
        for _ in range(3):
            state = state._replace(force_update=jnp.asarray(True))
            state, est = update(params, models, ctx, state, SE2.identity(), pts, mask)
        err = np.hypot(float(est.pose.x) - true[0], float(est.pose.y) - true[1])
        assert err < 0.5, err
        assert np.isfinite(np.asarray(state.particles.log_weight)).all()


class TestWindowedBeamLut:
    """Fleet-scale windowed range-LUT kernel (ops/pallas_beam_lut.py,
    interpret mode): parity with the gather path inside the window,
    all-casts-miss scoring outside it, fleet folding."""

    def _world(self):
        data = np.zeros((96, 96), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        data[40:46, 60:66] = OCCUPIED_VALUE
        data[20:24, 20:30] = OCCUPIED_VALUE
        return make_grid(data, 0.1)

    def _inputs(self, lut, states, points, mask):
        local = lut.origin_inv @ states
        k, h, w = lut.ranges.shape
        xi = jnp.clip(jnp.floor(local.x / lut.resolution).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.floor(local.y / lut.resolution).astype(jnp.int32), 0, h - 1)
        z = jnp.linalg.norm(points, axis=-1)
        bearing = jnp.arctan2(points[:, 1], points[:, 0])
        return local.theta, xi, yi, z, bearing

    def _mix(self, p):
        return jnp.asarray(
            [p.z_hit, p.z_short, p.z_rand, p.z_max, p.sigma_hit,
             p.lambda_short, p.beam_max_range], jnp.float32)

    def test_matches_gather_path_in_window(self):
        """Against the gather path fed the SAME bf16-quantized LUT the
        kernel reads, in-window parity is tight (erf approx only)."""
        import dataclasses

        from beluga_tpu.ops.pallas_beam_lut import _windowed_impl, build_lut_bf16

        world = self._world()
        params = BeamModelParams(beam_max_range=4.0)
        lut = build_range_lut(world, max_range=4.0, n_bearings=32)
        lut_bf16 = build_lut_bf16(lut.ranges)
        # gather-path oracle on the quantized table ([2Wq, K, Hq] x-major)
        qranges = jnp.transpose(lut_bf16, (1, 2, 0)).astype(jnp.float32)
        k, h, w = lut.ranges.shape
        lut_q = dataclasses.replace(lut, ranges=qranges[:, :h, :w])

        rng = np.random.default_rng(7)
        n, nb = 200, 12
        states = SE2.from_xytheta(
            jnp.asarray(rng.uniform(3.5, 6.0, n), jnp.float32),
            jnp.asarray(rng.uniform(3.5, 6.0, n), jnp.float32),
            jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32))
        ang = np.linspace(-np.pi, np.pi, nb, endpoint=False)
        r = rng.uniform(0.4, 2.5, nb)
        pts = jnp.asarray(np.stack([r * np.cos(ang), r * np.sin(ang)], -1),
                          jnp.float32)
        mask = jnp.asarray(rng.uniform(size=nb) > 0.2)

        want = np.asarray(beam_lut_weights(params, lut_q, states, pts, mask))
        theta, xi, yi, z, bearing = self._inputs(lut, states, pts, mask)
        got = np.asarray(_windowed_impl(
            lut_bf16, theta[None], xi[None], yi[None], z[None],
            bearing[None], mask[None], lut.max_range, self._mix(params),
            interpret=True)[0])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)

    def test_stray_scores_all_casts_miss(self):
        """An out-of-window particle reads z_mean = max_range on every
        beam — the bounded-error stray contract."""
        import dataclasses

        from beluga_tpu.ops.pallas_beam_lut import _windowed_impl, build_lut_bf16

        world = self._world()
        params = BeamModelParams(beam_max_range=4.0)
        lut = build_range_lut(world, max_range=4.0, n_bearings=16)
        lut_bf16 = build_lut_bf16(lut.ranges)

        rng = np.random.default_rng(8)
        n, nb = 64, 8
        xs = np.full(n, 8.0); ys = np.full(n, 8.0)
        xs[:3] = ys[:3] = 0.6  # strays: ~74 cells away from the cluster
        states = SE2.from_xytheta(
            jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
            jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32))
        ang = np.linspace(-np.pi, np.pi, nb, endpoint=False)
        pts = jnp.asarray(np.stack([1.5 * np.cos(ang), 1.5 * np.sin(ang)], -1),
                          jnp.float32)
        mask = jnp.ones(nb, bool)

        theta, xi, yi, z, bearing = self._inputs(lut, states, pts, mask)
        got = np.asarray(_windowed_impl(
            lut_bf16, theta[None], xi[None], yi[None], z[None],
            bearing[None], mask[None], lut.max_range, self._mix(params),
            interpret=True)[0])
        # oracle: gather path on a constant-max_range LUT (all casts miss)
        lut_miss = dataclasses.replace(
            lut, ranges=jnp.full_like(lut.ranges, lut.max_range))
        strays = jax.tree_util.tree_map(lambda l: l[:3], states)
        want_miss = np.asarray(
            beam_lut_weights(params, lut_miss, strays, pts, mask))
        np.testing.assert_allclose(got[:3], want_miss, rtol=2e-3)
        # ...and the cluster does NOT read all-miss
        assert np.abs(got[3:] / want_miss.mean() - 1.0).min() > 1e-3

    def test_fleet_folding_matches_per_filter(self):
        """F=2 filters folded into the tile grid == two single-filter calls."""
        from beluga_tpu.ops.pallas_beam_lut import _windowed_impl, build_lut_bf16

        world = self._world()
        params = BeamModelParams(beam_max_range=4.0)
        lut = build_range_lut(world, max_range=4.0, n_bearings=16)
        lut_bf16 = build_lut_bf16(lut.ranges)

        rng = np.random.default_rng(9)
        n, nb = 100, 6
        ang = np.linspace(-np.pi, np.pi, nb, endpoint=False)
        pts = jnp.asarray(np.stack([1.2 * np.cos(ang), 1.2 * np.sin(ang)], -1),
                          jnp.float32)
        mask = jnp.ones(nb, bool)
        rows = []
        for c in ((2.5, 2.5), (6.5, 6.5)):
            st = SE2.from_xytheta(
                jnp.asarray(rng.uniform(c[0] - 0.5, c[0] + 0.5, n), jnp.float32),
                jnp.asarray(rng.uniform(c[1] - 0.5, c[1] + 0.5, n), jnp.float32),
                jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32))
            rows.append(self._inputs(lut, st, pts, mask))
        stack = [jnp.stack([a[i] for a in rows]) for i in range(5)]
        mix = self._mix(params)
        batched = np.asarray(_windowed_impl(
            lut_bf16, *stack, jnp.broadcast_to(mask, (2, nb)),
            lut.max_range, mix, interpret=True))
        for fi in range(2):
            single = np.asarray(_windowed_impl(
                lut_bf16, *(a[None] for a in rows[fi]), mask[None],
                lut.max_range, mix, interpret=True)[0])
            np.testing.assert_allclose(batched[fi], single, rtol=1e-5)

    def test_small_map_padding(self):
        """Maps narrower than the 64-cell window pad up; origins stay valid."""
        from beluga_tpu.ops.pallas_beam_lut import (
            _CWX, _CWY, _windowed_impl, build_lut_bf16)

        data = np.zeros((40, 40), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        world = make_grid(data, 0.1)
        params = BeamModelParams(beam_max_range=4.0)
        lut = build_range_lut(world, max_range=4.0, n_bearings=8)
        lut_bf16 = build_lut_bf16(lut.ranges)
        assert lut_bf16.shape[0] >= _CWX and lut_bf16.shape[2] >= _CWY

        rng = np.random.default_rng(10)
        n, nb = 32, 4
        states = SE2.from_xytheta(
            jnp.asarray(rng.uniform(1.0, 3.0, n), jnp.float32),
            jnp.asarray(rng.uniform(1.0, 3.0, n), jnp.float32),
            jnp.zeros(n, jnp.float32))
        ang = np.linspace(-np.pi, np.pi, nb, endpoint=False)
        pts = jnp.asarray(np.stack([np.cos(ang), np.sin(ang)], -1), jnp.float32)
        mask = jnp.ones(nb, bool)
        theta, xi, yi, z, bearing = self._inputs(lut, states, pts, mask)
        got = np.asarray(_windowed_impl(
            lut_bf16, theta[None], xi[None], yi[None], z[None],
            bearing[None], mask[None], lut.max_range, self._mix(params),
            interpret=True)[0])
        assert np.isfinite(got).all() and (got > 0).all()

    def test_builder_windowed_ctx_and_cpu_fallback(self):
        """use_range_lut="windowed" publishes the bf16 LUT in ctx; off-TPU
        the update falls back to the gather path and still tracks."""
        from beluga_tpu.core.random import sample_normal_se2
        from beluga_tpu.filters.amcl import AmclParams, init_state, update
        from beluga_tpu.filters.builders import make_beam_filter

        world = self._world()
        models, ctx = make_beam_filter(
            world, BeamModelParams(beam_max_range=4.0),
            use_range_lut="windowed", n_bearings=32)
        assert "range_lut_bf16" in ctx
        assert ctx["range_lut_bf16"].dtype == jnp.bfloat16

        params = AmclParams(max_particles=256, min_particles=64)
        true = (4.8, 4.8, 0.3)
        nb = 16
        ang = np.linspace(-np.pi, np.pi, nb, endpoint=False)
        src = jnp.broadcast_to(jnp.asarray(true[:2], jnp.float32), (nb, 2))
        dirs = jnp.stack(
            [jnp.cos(jnp.asarray(ang + true[2], jnp.float32)),
             jnp.sin(jnp.asarray(ang + true[2], jnp.float32))], -1)
        dist, hit = cast_rays(world, src, dirs, 4.0, resolution_hint=0.1)
        r = np.asarray(dist)
        pts = jnp.asarray(np.stack([r * np.cos(ang), r * np.sin(ang)], -1),
                          jnp.float32)
        mask = jnp.asarray(np.asarray(hit))
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        states = sample_normal_se2(
            k1, 256, SE2.from_xytheta(*true), jnp.eye(3) * 0.04)
        state = init_state(k2, states, params)
        for _ in range(3):
            state = state._replace(force_update=jnp.asarray(True))
            state, est = update(params, models, ctx, state, SE2.identity(), pts, mask)
        err = np.hypot(float(est.pose.x) - true[0], float(est.pose.y) - true[1])
        assert err < 0.5, err

    def test_banded_stage2_matches_gather(self):
        """Tight-theta clouds take the banded stage-2 path (K >= 2*_BAND);
        parity with the gather oracle holds, including bin wraparound at
        the +-pi seam."""
        import dataclasses

        from beluga_tpu.ops.pallas_beam_lut import (
            _BAND, _windowed_impl, build_lut_bf16)

        world = self._world()
        params = BeamModelParams(beam_max_range=4.0)
        kb = 128
        assert kb >= 2 * _BAND
        lut = build_range_lut(world, max_range=4.0, n_bearings=kb)
        lut_bf16 = build_lut_bf16(lut.ranges)
        qranges = jnp.transpose(lut_bf16, (1, 2, 0)).astype(jnp.float32)
        k, h, w = lut.ranges.shape
        lut_q = dataclasses.replace(lut, ranges=qranges[:, :h, :w])

        rng = np.random.default_rng(11)
        n, nb = 150, 10
        ang = np.linspace(-np.pi, np.pi, nb, endpoint=False)
        r = rng.uniform(0.4, 2.5, nb)
        pts = jnp.asarray(np.stack([r * np.cos(ang), r * np.sin(ang)], -1),
                          jnp.float32)
        mask = jnp.ones(nb, bool)
        for tc in (0.3, np.pi):  # pi: band straddles the bin seam
            th = np.mod(rng.normal(tc, 0.08, n) + np.pi, 2 * np.pi) - np.pi
            states = SE2.from_xytheta(
                jnp.asarray(rng.uniform(4.0, 5.5, n), jnp.float32),
                jnp.asarray(rng.uniform(4.0, 5.5, n), jnp.float32),
                jnp.asarray(th, jnp.float32))
            want = np.asarray(beam_lut_weights(params, lut_q, states, pts, mask))
            theta, xi, yi, z, bearing = self._inputs(lut, states, pts, mask)
            got = np.asarray(_windowed_impl(
                lut_bf16, theta[None], xi[None], yi[None], z[None],
                bearing[None], mask[None], lut.max_range, self._mix(params),
                interpret=True)[0])
            np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5,
                                       err_msg=f"tc={tc}")

    def test_masked_nan_beam_does_not_poison(self):
        """A masked beam carrying a NaN point (the standard invalid-return
        encoding) must not poison the weights (regression: 0*NaN=NaN)."""
        from beluga_tpu.ops.pallas_beam_lut import _windowed_impl, build_lut_bf16

        world = self._world()
        params = BeamModelParams(beam_max_range=4.0)
        lut = build_range_lut(world, max_range=4.0, n_bearings=16)
        lut_bf16 = build_lut_bf16(lut.ranges)
        rng = np.random.default_rng(12)
        n, nb = 50, 6
        states = SE2.from_xytheta(
            jnp.asarray(rng.uniform(4.0, 5.0, n), jnp.float32),
            jnp.asarray(rng.uniform(4.0, 5.0, n), jnp.float32),
            jnp.zeros(n, jnp.float32))
        ang = np.linspace(-np.pi, np.pi, nb, endpoint=False)
        pts = np.stack([1.5 * np.cos(ang), 1.5 * np.sin(ang)], -1)
        pts[2] = np.nan  # invalid return
        mask = np.ones(nb, bool); mask[2] = False
        theta, xi, yi, z, bearing = self._inputs(
            lut, states, jnp.asarray(pts, jnp.float32), jnp.asarray(mask))
        got = np.asarray(_windowed_impl(
            lut_bf16, theta[None], xi[None], yi[None], z[None],
            bearing[None], jnp.asarray(mask)[None], lut.max_range,
            self._mix(params), interpret=True)[0])
        assert np.isfinite(got).all()
        # oracle: same scan with the NaN beam replaced by a benign point
        pts2 = pts.copy(); pts2[2] = (1.0, 0.0)
        theta, xi, yi, z2, b2 = self._inputs(
            lut, states, jnp.asarray(pts2, jnp.float32), jnp.asarray(mask))
        want = np.asarray(_windowed_impl(
            lut_bf16, theta[None], xi[None], yi[None], z2[None],
            b2[None], jnp.asarray(mask)[None], lut.max_range,
            self._mix(params), interpret=True)[0])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_pad_slots_use_first_particle(self):
        """With n not a multiple of the tile and a stray in the LAST slot
        (the strays-last sort order), the pad lanes must not recenter the
        window on the stray (regression: edge-padding)."""
        import dataclasses

        from beluga_tpu.ops.pallas_beam_lut import _windowed_impl, build_lut_bf16

        world = self._world()
        params = BeamModelParams(beam_max_range=4.0)
        lut = build_range_lut(world, max_range=4.0, n_bearings=16)
        lut_bf16 = build_lut_bf16(lut.ranges)
        qranges = jnp.transpose(lut_bf16, (1, 2, 0)).astype(jnp.float32)
        k, h, w = lut.ranges.shape
        lut_q = dataclasses.replace(lut, ranges=qranges[:, :h, :w])

        rng = np.random.default_rng(13)
        n, nb = 200, 6
        xs = rng.uniform(4.2, 5.2, n); ys = rng.uniform(4.2, 5.2, n)
        xs[-1] = ys[-1] = 0.8  # stray in the final slot
        states = SE2.from_xytheta(
            jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
            jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32))
        ang = np.linspace(-np.pi, np.pi, nb, endpoint=False)
        pts = jnp.asarray(np.stack([1.4 * np.cos(ang), 1.4 * np.sin(ang)], -1),
                          jnp.float32)
        mask = jnp.ones(nb, bool)
        want = np.asarray(beam_lut_weights(params, lut_q, states, pts, mask))
        theta, xi, yi, z, bearing = self._inputs(lut, states, pts, mask)
        got = np.asarray(_windowed_impl(
            lut_bf16, theta[None], xi[None], yi[None], z[None],
            bearing[None], mask[None], lut.max_range, self._mix(params),
            interpret=True)[0])
        # the cloud (all but the stray) must match the oracle — not all-miss
        np.testing.assert_allclose(got[:-1], want[:-1], rtol=2e-3, atol=1e-5)
