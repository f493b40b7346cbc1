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
