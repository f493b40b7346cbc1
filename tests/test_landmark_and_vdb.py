"""Landmark/bearing sensor models and 3D (VDB-style) likelihood field tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.lie import SE2, SE3, SO3
from beluga_tpu.maps.voxel import (
    make_distance_grid,
    make_distance_grid_from_points,
    squared_distance_transform_3d,
)
from beluga_tpu.models.sensor.landmark import (
    BearingModelParams,
    LandmarkModelParams,
    bearing_weights,
    landmark_weights,
    make_landmark_map,
)
from beluga_tpu.models.sensor.vdb_likelihood import (
    VdbLikelihoodFieldParams,
    vdb_likelihood_weights,
)


class TestLandmarkModel:
    def setup_method(self):
        self.lmap = make_landmark_map(
            positions=[[5.0, 0.0, 0.0], [0.0, 5.0, 0.0], [-5.0, 0.0, 1.0]],
            categories=[0, 0, 1],
        )
        self.params = LandmarkModelParams(sigma_range=0.3, sigma_bearing=0.2)

    def test_perfect_detection_max_weight(self):
        # particle at identity sees landmark 0 exactly where it is
        states = SE2.from_xytheta(jnp.asarray([0.0, 2.0]), jnp.zeros(2), jnp.zeros(2))
        det = jnp.asarray([[5.0, 0.0, 0.0]], jnp.float32)
        cats = jnp.asarray([0], jnp.int32)
        w = landmark_weights(self.params, self.lmap, states, det, cats, jnp.ones(1, bool))
        assert float(w[0]) == pytest.approx(1.0 + self.params.random_prob, abs=1e-5)
        assert float(w[1]) < float(w[0])

    def test_category_filtering(self):
        # detection of category 1 must match the category-1 landmark, not the
        # closer category-0 one
        states = SE2.from_xytheta(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1))
        det = jnp.asarray([[-5.0, 0.0, 1.0]], jnp.float32)
        w_right = landmark_weights(
            self.params, self.lmap, states, det, jnp.asarray([1]), jnp.ones(1, bool)
        )
        w_wrong = landmark_weights(
            self.params, self.lmap, states, det, jnp.asarray([0]), jnp.ones(1, bool)
        )
        assert float(w_right[0]) > float(w_wrong[0])

    def test_rotated_particle(self):
        # particle rotated 90deg: detection in robot frame (0, 5) maps onto
        # the landmark at world (-5, 0)... with yaw=pi/2, robot x-axis = world
        # y: detection (5, 0) in robot frame -> world (0, 5) = landmark 1
        states = SE2.from_xytheta(jnp.zeros(1), jnp.zeros(1), jnp.asarray([np.pi / 2]))
        det = jnp.asarray([[5.0, 0.0, 0.0]], jnp.float32)
        w = landmark_weights(
            self.params, self.lmap, states, det, jnp.asarray([0]), jnp.ones(1, bool)
        )
        assert float(w[0]) == pytest.approx(1.0 + self.params.random_prob, abs=1e-4)

    def test_product_over_detections(self):
        states = SE2.from_xytheta(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1))
        det = jnp.asarray([[5.0, 0.0, 0.0], [0.0, 5.0, 0.0]], jnp.float32)
        cats = jnp.asarray([0, 0], jnp.int32)
        w2 = landmark_weights(self.params, self.lmap, states, det, cats, jnp.ones(2, bool))
        w1 = landmark_weights(
            self.params, self.lmap, states, det, cats, jnp.asarray([True, False])
        )
        assert float(w2[0]) == pytest.approx(float(w1[0]) * (1.0 + self.params.random_prob), rel=1e-4)

    def test_se3_states(self):
        states = SE3.identity((1,))
        det = jnp.asarray([[5.0, 0.0, 0.0]], jnp.float32)
        w = landmark_weights(
            self.params, self.lmap, states, det, jnp.asarray([0]), jnp.ones(1, bool)
        )
        assert float(w[0]) == pytest.approx(1.0 + self.params.random_prob, abs=1e-5)


class TestBearingModel:
    def test_aligned_bearing(self):
        lmap = make_landmark_map([[10.0, 0.0, 0.0]], [0])
        params = BearingModelParams(sigma_bearing=0.1)
        states = SE2.from_xytheta(jnp.asarray([0.0, 0.0]), jnp.zeros(2), jnp.asarray([0.0, np.pi / 4]))
        det = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        w = bearing_weights(params, lmap, states, det, jnp.asarray([0]), jnp.ones(1, bool))
        assert float(w[0]) == pytest.approx(1.0, abs=1e-5)
        # rotated particle sees the landmark 45deg off its detection
        expected = np.exp(-(np.pi / 4) ** 2 / (2 * 0.1**2))
        assert float(w[1]) == pytest.approx(expected, rel=1e-3, abs=1e-6)


class TestDistanceGrid3:
    def test_edt3d_matches_brute_force(self):
        rng = np.random.default_rng(0)
        obs = rng.random((6, 7, 8)) < 0.1
        got = np.asarray(squared_distance_transform_3d(jnp.asarray(obs), 100.0))
        zs, ys, xs = np.nonzero(obs)
        want = np.zeros_like(got)
        for z in range(6):
            for y in range(7):
                for x in range(8):
                    if len(zs):
                        want[z, y, x] = ((zs - z) ** 2 + (ys - y) ** 2 + (xs - x) ** 2).min()
                    else:
                        want[z, y, x] = 100.0**2
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_distance_lookup(self):
        obs = np.zeros((5, 5, 5), bool)
        obs[2, 2, 2] = True  # obstacle at world (2, 2, 2) with voxel 1.0
        g = make_distance_grid(obs, 1.0)
        d = g.distance_at(jnp.asarray([[2.0, 2.0, 2.0], [2.0, 2.0, 4.0], [100.0, 0.0, 0.0]]))
        np.testing.assert_allclose(d[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(d[1], 2.0, atol=1e-5)
        np.testing.assert_allclose(d[2], float(g.background))

    def test_from_points(self):
        pts = [[1.0, 1.0, 1.0], [2.0, 2.0, 2.0]]
        g = make_distance_grid_from_points(pts, 0.25)
        d = g.distance_at(jnp.asarray([[1.0, 1.0, 1.0]]))
        np.testing.assert_allclose(d[0], 0.0, atol=1e-6)


class TestVdbLikelihoodModel:
    def test_weight_prefers_true_pose(self):
        # a wall of obstacle points at x=3
        wall = [[3.0, y * 0.2, z * 0.2] for y in range(10) for z in range(5)]
        grid = make_distance_grid_from_points(wall, 0.1, max_distance=5.0)
        params = VdbLikelihoodFieldParams(max_laser_distance=5.0)

        # measurement: point 3 m ahead (the wall, seen from the origin)
        points = jnp.asarray([[3.0, 1.0, 0.4]], jnp.float32)
        mask = jnp.ones(1, bool)
        states = SE2.from_xytheta(jnp.asarray([0.0, 1.0]), jnp.zeros(2), jnp.zeros(2))
        w = vdb_likelihood_weights(params, grid, states, points, mask)
        assert float(w[0]) > float(w[1])
        # perfect hit: amplitude + offset + 1
        amp = 0.5 / (0.2 * np.sqrt(2 * np.pi))
        assert float(w[0]) == pytest.approx(1.0 + amp + 0.5 / 5.0, rel=1e-3)

    def test_se3_states(self):
        wall = [[3.0, y * 0.2, z * 0.2] for y in range(10) for z in range(5)]
        grid = make_distance_grid_from_points(wall, 0.1, max_distance=5.0)
        params = VdbLikelihoodFieldParams(max_laser_distance=5.0)
        points = jnp.asarray([[3.0, 1.0, 0.4]], jnp.float32)
        states = SE3.identity((1,))
        w = vdb_likelihood_weights(params, grid, states, points, jnp.ones(1, bool))
        amp = 0.5 / (0.2 * np.sqrt(2 * np.pi))
        assert float(w[0]) == pytest.approx(1.0 + amp + 0.1, rel=1e-3)


def test_vdb_codebook_lookup_matches_gather():
    """The flattened-volume one-hot path reproduces the 3D gather."""
    from beluga_tpu.maps.voxel import make_distance_codes, make_distance_grid

    rng = np.random.default_rng(0)
    occ = np.zeros((10, 40, 56), bool)
    occ[rng.integers(0, 10, 30), rng.integers(0, 40, 30), rng.integers(0, 56, 30)] = True
    grid = make_distance_grid(occ, 0.25, max_distance=3.0)
    codes_book = make_distance_codes(grid, 0.25, 3.0)
    pts = jnp.asarray(rng.uniform(-1.0, 14.5, (300, 3)), jnp.float32)
    want = grid.distance_at(pts)
    got = grid.distance_at(pts, codes_book=codes_book)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-6)
