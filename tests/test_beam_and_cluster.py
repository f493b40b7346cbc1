"""Raycasting, beam sensor model, and cluster-based estimation tests.

Beam-model golden values come from the reference unit tests
(beluga/test/beluga/sensor/test_beam_model.cpp:28-120).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.algorithms.cluster import ClusterizerParams, cluster_based_estimate
from beluga_tpu.lie import SE2, SO2
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.models.sensor.beam import BeamModelParams, beam_weights
from beluga_tpu.ops.raycast import cast_rays


def grid_5x5(resolution=0.5):
    data = np.zeros((5, 5), np.int8)
    data[2, 2] = OCCUPIED_VALUE
    return make_grid(data, resolution)


def bresenham_cast(grid_np, resolution, src_xy, bearing, max_range):
    """Host-side oracle replicating Ray2d::cast (raycasting.hpp:97-107)."""
    h, w = grid_np.shape
    src_cell = np.floor(np.asarray(src_xy) / resolution).astype(int)
    far = np.asarray(src_xy) + max_range * np.asarray(
        [np.cos(bearing), np.sin(bearing)]
    )
    far_cell = np.floor(far / resolution).astype(int)
    x0, y0 = src_cell
    x1, y1 = far_cell
    dx, dy = abs(x1 - x0), abs(y1 - y0)
    sx, sy = (1 if x1 >= x0 else -1), (1 if y1 >= y0 else -1)
    err = dx - dy
    x, y = x0, y0
    while True:
        if not (0 <= x < w and 0 <= y < h):
            return None
        if grid_np[y, x] == OCCUPIED_VALUE:
            d = resolution * np.hypot(x - x0, y - y0)
            return min(d, max_range)
        if x == x1 and y == y1:
            return None
        e2 = 2 * err
        if e2 > -dy:
            err -= dy
            x += sx
        if e2 < dx:
            err += dx
            y += sy


def supercover_line(p0, p1):
    """Host-side oracle replicating the kModified iterator
    (bresenham.hpp:86-161): emission-ordered cell list."""
    x0, y0 = p0
    x1, y1 = p1
    x, y = x0, y0
    xspan, xstep = x1 - x0, 1
    if xspan < 0:
        xspan, xstep = -xspan, -1
    yspan, ystep = y1 - y0, 1
    if yspan < 0:
        yspan, ystep = -yspan, -1
    reversed_ = xspan < yspan
    if reversed_:
        x, y = y, x
        xspan, yspan = yspan, xspan
        xstep, ystep = ystep, xstep
    emit = (lambda a, b: (b, a)) if reversed_ else (lambda a, b: (a, b))
    dx2, dy2 = 2 * xspan, 2 * yspan
    error = prev = xspan
    cells = [emit(x, y)]
    for _ in range(xspan):
        x += xstep
        error += dy2
        if error > dx2:
            y += ystep
            error -= dx2
            if error + prev <= dx2:
                cells.append(emit(x, y - ystep))
            if error + prev >= dx2:
                cells.append(emit(x - xstep, y))
        cells.append(emit(x, y))
        prev = error
    return cells


def supercover_cast(grid_np, resolution, src_xy, bearing, max_range):
    """Ray2d::cast over the supercover line (raycasting.hpp:97-107)."""
    h, w = grid_np.shape
    src_cell = np.floor(np.asarray(src_xy) / resolution).astype(int)
    far = np.asarray(src_xy) + max_range * np.asarray(
        [np.cos(bearing), np.sin(bearing)]
    )
    far_cell = np.floor(far / resolution).astype(int)
    for x, y in supercover_line(tuple(src_cell), tuple(far_cell)):
        if not (0 <= x < w and 0 <= y < h):
            return None
        if grid_np[y, x] == OCCUPIED_VALUE:
            d = resolution * np.hypot(x - src_cell[0], y - src_cell[1])
            return min(d, max_range)
    return None


class TestSupercoverRaycast:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_supercover_oracle(self, seed):
        rng = np.random.default_rng(seed)
        data = np.zeros((40, 40), np.int8)
        data[rng.random((40, 40)) < 0.08] = OCCUPIED_VALUE
        g = make_grid(data, 0.25)
        grid_np = np.asarray(g.data)

        srcs, dirs, oracle = [], [], []
        for _ in range(80):
            sx, sy = rng.uniform(1.0, 9.0, 2)
            if grid_np[int(sy / 0.25), int(sx / 0.25)] == OCCUPIED_VALUE:
                continue
            bearing = rng.uniform(-np.pi, np.pi)
            srcs.append([sx, sy])
            dirs.append([np.cos(bearing), np.sin(bearing)])
            oracle.append(supercover_cast(grid_np, 0.25, [sx, sy], bearing, 8.0))

        dist, hit = cast_rays(
            g, jnp.asarray(srcs, jnp.float32), jnp.asarray(dirs, jnp.float32),
            8.0, variant="supercover",
        )
        for i, o in enumerate(oracle):
            if o is None:
                assert not bool(hit[i]), f"ray {i}: unexpected hit {float(dist[i])}"
            else:
                assert bool(hit[i]), f"ray {i}: missed expected hit at {o}"
                assert float(dist[i]) == pytest.approx(o, abs=1e-4), f"ray {i}"

    def test_corner_crossing_cannot_tunnel(self):
        # a 45° ray through the exact corner between two diagonal obstacle
        # cells: standard Bresenham steps through the gap, supercover emits
        # both axis-adjacent cells and must hit.
        data = np.zeros((6, 6), np.int8)
        data[2, 3] = OCCUPIED_VALUE  # (x=3, y=2)
        data[3, 2] = OCCUPIED_VALUE  # (x=2, y=3)
        g = make_grid(data, 1.0)
        src = jnp.asarray([[0.5, 0.5]])  # cell (0, 0)
        d = jnp.asarray([[np.cos(np.pi / 4), np.sin(np.pi / 4)]], jnp.float32)

        dist_std, hit_std = cast_rays(g, src, d, 10.0, variant="standard")
        dist_sc, hit_sc = cast_rays(g, src, d, 10.0, variant="supercover")
        assert not bool(hit_std[0])  # tunnels through the diagonal gap
        assert bool(hit_sc[0])
        # first emitted intermediate cell is (a_new, b) = (x=3, y=2):
        # distance = hypot(3, 2)
        assert float(dist_sc[0]) == pytest.approx(np.hypot(3, 2), abs=1e-5)

    def test_supercover_emits_line_touched_cells(self):
        # oracle self-check on the documented 45° behavior: every primary
        # step emits both intermediate cells plus the diagonal cell
        cells = supercover_line((0, 0), (3, 3))
        assert cells == [
            (0, 0),
            (1, 0), (0, 1), (1, 1),
            (2, 1), (1, 2), (2, 2),
            (3, 2), (2, 3), (3, 3),
        ]

    def test_beam_weights_supercover_variant(self):
        g = grid_5x5()
        states = SE2.from_xytheta(
            jnp.asarray([1.25]), jnp.asarray([1.25]), jnp.asarray([0.0])
        )
        points = jnp.asarray([[1.0, 1.0], [0.5, 0.0]], jnp.float32)
        mask = jnp.ones(2, bool)
        w = beam_weights(
            BeamModelParams(beam_max_range=10.0), g, states, points, mask,
            variant="supercover",
        )
        assert np.isfinite(float(w[0])) and float(w[0]) > 0.0


class TestRaycast:
    def test_cardinal_hit(self):
        g = grid_5x5()
        dist, hit = cast_rays(
            g,
            jnp.asarray([[0.25, 1.25]]),  # centered in cell (0, 2)
            jnp.asarray([[1.0, 0.0]]),
            max_range=10.0,
        )
        assert bool(hit[0])
        assert float(dist[0]) == pytest.approx(1.0, abs=1e-5)  # 2 cells * 0.5

    def test_diagonal_hit(self):
        g = grid_5x5()
        dist, hit = cast_rays(
            g,
            jnp.asarray([[0.25, 0.25]]),
            jnp.asarray([[np.cos(np.pi / 4), np.sin(np.pi / 4)]], dtype=np.float32),
            max_range=10.0,
        )
        assert bool(hit[0])
        assert float(dist[0]) == pytest.approx(np.sqrt(2.0), abs=1e-4)

    def test_miss_exits_grid(self):
        g = grid_5x5()
        dist, hit = cast_rays(
            g, jnp.asarray([[0.25, 0.25]]), jnp.asarray([[-1.0, 0.0]]), max_range=10.0
        )
        assert not bool(hit[0])

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_bresenham_oracle(self, seed):
        rng = np.random.default_rng(seed)
        data = np.zeros((40, 40), np.int8)
        data[rng.random((40, 40)) < 0.08] = OCCUPIED_VALUE
        g = make_grid(data, 0.25)
        grid_np = np.asarray(g.data)

        srcs, dirs, oracle = [], [], []
        for _ in range(60):
            sx, sy = rng.uniform(1.0, 9.0, 2)
            if grid_np[int(sy / 0.25), int(sx / 0.25)] == OCCUPIED_VALUE:
                continue
            bearing = rng.uniform(-np.pi, np.pi)
            srcs.append([sx, sy])
            dirs.append([np.cos(bearing), np.sin(bearing)])
            oracle.append(bresenham_cast(grid_np, 0.25, [sx, sy], bearing, 8.0))

        dist, hit = cast_rays(
            g, jnp.asarray(srcs, jnp.float32), jnp.asarray(dirs, jnp.float32), 8.0
        )
        # the vectorized Bresenham visits the exact reference cell sequence
        for i, o in enumerate(oracle):
            if o is None:
                assert not bool(hit[i]), f"ray {i}: unexpected hit {float(dist[i])}"
            else:
                assert bool(hit[i]), f"ray {i}: missed expected hit at {o}"
                assert float(dist[i]) == pytest.approx(o, abs=1e-4), f"ray {i}"


class TestBeamModel:
    """Golden values from test_beam_model.cpp:40-81."""

    PARAMS = BeamModelParams(
        z_hit=0.5, z_short=0.05, z_max=0.05, z_rand=0.5,
        sigma_hit=0.2, lambda_short=0.1, beam_max_range=60.0,
    )

    def _weight(self, grid, points, state=None):
        state = state if state is not None else SE2.identity()
        states = SE2(state.xy[None], SO2(state.rot.z[None]))
        pts = jnp.asarray(points, jnp.float32)
        mask = jnp.ones(len(points), bool)
        return float(beam_weights(self.PARAMS, grid, states, pts, mask)[0])

    def test_perfect_hit(self):
        g = grid_5x5()
        assert self._weight(g, [[1.0, 1.0]]) == pytest.approx(1.0171643824743635, abs=1e-5)

    def test_short_reading(self):
        g = grid_5x5()
        assert self._weight(g, [[0.75, 0.75]]) == pytest.approx(
            0.015905891701088148, abs=1e-5
        )

    def test_past_obstacle_near_zero(self):
        g = grid_5x5()
        assert self._weight(g, [[2.25, 2.25]]) == pytest.approx(0.0, abs=1e-5)

    def test_max_range_return(self):
        g = grid_5x5()
        assert self._weight(g, [[60.0, 60.0]]) == pytest.approx(
            0.00012500000000000003, abs=1e-6
        )

    def test_empty_grid_near_zero(self):
        data = np.zeros((5, 5), np.int8)
        g = make_grid(data, 0.5)
        assert self._weight(g, [[1.0, 1.0]]) == pytest.approx(0.0, abs=1e-3)


class TestClusterEstimate:
    def test_single_blob_matches_plain_estimate(self):
        rng = np.random.default_rng(0)
        n = 2000
        xy = rng.normal([2.0, 3.0], 0.05, (n, 2)).astype(np.float32)
        th = rng.normal(0.3, 0.03, n).astype(np.float32)
        states = SE2.from_xytheta(jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1]), jnp.asarray(th))
        w = jnp.ones(n)
        mean, cov = cluster_based_estimate(states, w)
        np.testing.assert_allclose(np.asarray(mean.xy), [2.0, 3.0], atol=0.02)
        assert float(mean.theta) == pytest.approx(0.3, abs=0.02)
        assert np.isfinite(np.asarray(cov)[:2, :2]).all()

    def test_picks_heaviest_of_two_blobs(self):
        rng = np.random.default_rng(1)
        n = 1000
        # blob A at (0,0) with 30% of weight; blob B at (5,5) with 70%
        xy_a = rng.normal([0.0, 0.0], 0.05, (n // 2, 2))
        xy_b = rng.normal([5.0, 5.0], 0.05, (n // 2, 2))
        xy = np.concatenate([xy_a, xy_b]).astype(np.float32)
        th = np.zeros(n, np.float32)
        w = np.concatenate([np.full(n // 2, 0.3 / (n // 2)), np.full(n // 2, 0.7 / (n // 2))])
        states = SE2.from_xytheta(jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1]), jnp.asarray(th))
        mean, _ = cluster_based_estimate(states, jnp.asarray(w, jnp.float32))
        np.testing.assert_allclose(np.asarray(mean.xy), [5.0, 5.0], atol=0.05)

    def test_heavier_small_cluster_wins_over_wide_light_one(self):
        # cluster weight is the *sum* of member-cell weights; a compact heavy
        # blob must beat a diffuse light one even with fewer particles
        rng = np.random.default_rng(2)
        xy_heavy = rng.normal([1.0, 1.0], 0.05, (200, 2))
        xy_light = rng.normal([6.0, 6.0], 0.4, (800, 2))
        xy = np.concatenate([xy_heavy, xy_light]).astype(np.float32)
        w = np.concatenate([np.full(200, 4.0), np.full(800, 0.25)]).astype(np.float32)
        states = SE2.from_xytheta(
            jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1]), jnp.zeros(1000)
        )
        mean, _ = cluster_based_estimate(states, jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(mean.xy), [1.0, 1.0], atol=0.1)

    def test_masked_particles_excluded(self):
        xy = np.array([[0.0, 0.0]] * 10 + [[9.0, 9.0]] * 10, np.float32)
        states = SE2.from_xytheta(
            jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1]), jnp.zeros(20)
        )
        mask = jnp.asarray([True] * 10 + [False] * 10)
        mean, _ = cluster_based_estimate(states, jnp.ones(20), mask)
        np.testing.assert_allclose(np.asarray(mean.xy), [0.0, 0.0], atol=1e-4)

    def test_fallback_all_singletons(self):
        # every particle in its own cell -> no multi-particle cluster ->
        # plain estimate fallback (cluster_based_estimation.hpp:423-426)
        xy = np.stack([np.arange(10) * 5.0, np.zeros(10)], -1).astype(np.float32)
        states = SE2.from_xytheta(jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1]), jnp.zeros(10))
        mean, cov = cluster_based_estimate(states, jnp.ones(10))
        assert float(mean.x) == pytest.approx(np.mean(xy[:, 0]), abs=1e-3)

    def test_jittable(self):
        rng = np.random.default_rng(3)
        xy = rng.normal(0, 1, (512, 2)).astype(np.float32)
        states = SE2.from_xytheta(jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1]), jnp.zeros(512))
        f = jax.jit(cluster_based_estimate)
        mean, cov = f(states, jnp.ones(512))
        assert np.isfinite(np.asarray(mean.xy)).all()

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_dense_matches_sparse(self, seed):
        """The O(N²) equality-matrix form and the unique/segment-sum form
        compute the same clusterization (same ranks, parents, cluster
        choice) — estimates agree to float-reassociation tolerance."""
        import functools

        rng = np.random.default_rng(seed)
        n = 700
        # several blobs + a diffuse background + dead particles
        centers = rng.uniform(0, 8, (4, 3))
        idx = rng.integers(0, 4, n)
        xyth = centers[idx] + rng.normal(0, 0.25, (n, 3))
        states = SE2.from_xytheta(
            jnp.asarray(xyth[:, 0], jnp.float32),
            jnp.asarray(xyth[:, 1], jnp.float32),
            jnp.asarray(xyth[:, 2], jnp.float32),
        )
        w = jnp.asarray(rng.random(n).astype(np.float32))
        mask = jnp.asarray(rng.random(n) > 0.1)

        md, cd = jax.jit(
            functools.partial(cluster_based_estimate, method="dense")
        )(states, w, mask)
        ms, cs = jax.jit(
            functools.partial(cluster_based_estimate, method="sparse")
        )(states, w, mask)
        np.testing.assert_allclose(np.asarray(md.xy), np.asarray(ms.xy),
                                   rtol=1e-4, atol=1e-5)
        assert float(md.theta) == pytest.approx(float(ms.theta), abs=1e-4)
        np.testing.assert_allclose(np.asarray(cd)[:2, :2], np.asarray(cs)[:2, :2],
                                   rtol=1e-3, atol=1e-6)

    def test_dense_masked_and_fallback(self):
        # masked exclusion and the all-singletons fallback on the dense path
        xy = np.array([[0.0, 0.0]] * 10 + [[9.0, 9.0]] * 10, np.float32)
        states = SE2.from_xytheta(
            jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1]), jnp.zeros(20)
        )
        mask = jnp.asarray([True] * 10 + [False] * 10)
        mean, _ = cluster_based_estimate(states, jnp.ones(20), mask, method="dense")
        np.testing.assert_allclose(np.asarray(mean.xy), [0.0, 0.0], atol=1e-4)

        xy = np.stack([np.arange(10) * 5.0, np.zeros(10)], -1).astype(np.float32)
        states = SE2.from_xytheta(
            jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1]), jnp.zeros(10)
        )
        mean, _ = cluster_based_estimate(states, jnp.ones(10), method="dense")
        assert float(mean.x) == pytest.approx(np.mean(xy[:, 0]), abs=1e-3)
