"""Unscented transform, metrics, and viz helper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.algorithms.unscented import unscented_transform
from beluga_tpu.io.viz import (
    likelihood_field_as_occupancy,
    particle_markers,
    resampled_pose_array,
)
from beluga_tpu.utils.metrics import ape, compare_runs


class TestUnscentedTransform:
    def test_linear_fn_preserves_moments(self):
        mean = jnp.asarray([1.0, 2.0])
        cov = jnp.asarray([[0.5, 0.1], [0.1, 0.3]])
        A = jnp.asarray([[2.0, 0.0], [1.0, 1.0]])

        out_mean, out_cov = unscented_transform(mean, cov, lambda p: p @ A.T)
        np.testing.assert_allclose(out_mean, A @ mean, atol=1e-5)
        np.testing.assert_allclose(out_cov, A @ cov @ A.T, atol=1e-5)

    def test_identity(self):
        mean = jnp.asarray([0.5, -1.0, 2.0])
        cov = jnp.eye(3) * 0.2
        m, c = unscented_transform(mean, cov, lambda p: p)
        np.testing.assert_allclose(m, mean, atol=1e-6)
        np.testing.assert_allclose(c, cov, atol=1e-5)

    def test_nonlinear_polar(self):
        # project (r, theta) -> (x, y); compare against dense Monte Carlo
        mean = jnp.asarray([5.0, 0.3])
        cov = jnp.diag(jnp.asarray([0.01, 0.001]))

        def to_cart(p):
            return jnp.stack([p[:, 0] * jnp.cos(p[:, 1]), p[:, 0] * jnp.sin(p[:, 1])], -1)

        m, c = unscented_transform(mean, cov, to_cart)
        rng = np.random.default_rng(0)
        samples = rng.multivariate_normal(np.asarray(mean), np.asarray(cov), 200000)
        cart = np.stack(
            [samples[:, 0] * np.cos(samples[:, 1]), samples[:, 0] * np.sin(samples[:, 1])], -1
        )
        np.testing.assert_allclose(m, cart.mean(0), atol=2e-3)
        np.testing.assert_allclose(c, np.cov(cart.T), rtol=0.05, atol=2e-4)

    def test_custom_mean_and_residual_for_angles(self):
        # angles near the +/-pi branch cut need circular mean + residual
        # (the reference exposes the same customization points)
        mean = jnp.asarray([3.1])
        cov = jnp.asarray([[0.04]])

        def wrap(p):
            return jnp.arctan2(jnp.sin(p), jnp.cos(p))

        def circ_mean(pts, w):
            s = jnp.einsum("s,sm->m", w, jnp.sin(pts))
            c = jnp.einsum("s,sm->m", w, jnp.cos(pts))
            return jnp.arctan2(s, c)

        m, c = unscented_transform(
            mean,
            cov,
            lambda p: wrap(p + 0.2),
            mean_fn=circ_mean,
            residual_fn=lambda a, b: wrap(a - b),
        )
        assert abs(float(wrap(m - (3.3 - 2 * np.pi))[0])) < 1e-5
        assert float(c[0, 0]) == pytest.approx(0.04, rel=1e-2)


class TestMetrics:
    def test_ape_zero_error(self):
        t = np.stack([np.arange(10.0), np.zeros(10), np.zeros(10)], -1)
        m = ape(t, t)
        assert m["rmse"] == 0.0 and m["yaw_rmse"] == 0.0

    def test_ape_known_error(self):
        gt = np.zeros((5, 3))
        est = gt.copy()
        est[:, 0] = 0.3
        est[:, 2] = 0.1
        m = ape(est, gt)
        assert m["rmse"] == pytest.approx(0.3)
        assert m["yaw_rmse"] == pytest.approx(0.1)

    def test_yaw_wrap(self):
        gt = np.array([[0.0, 0.0, np.pi - 0.05]])
        est = np.array([[0.0, 0.0, -np.pi + 0.05]])
        m = ape(est, gt)
        assert m["yaw_rmse"] == pytest.approx(0.1, abs=1e-6)

    def test_compare_runs_renders(self):
        m = ape(np.zeros((3, 3)), np.zeros((3, 3)))
        out = compare_runs({"a": m, "b": m})
        assert "rmse" in out and "a" in out


class TestViz:
    def test_likelihood_field_occupancy(self):
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
        from beluga_tpu.models.sensor.likelihood_field import (
            LikelihoodFieldParams,
            make_likelihood_field,
        )

        data = np.zeros((10, 10), np.int8)
        data[5, 5] = OCCUPIED_VALUE
        field = make_likelihood_field(LikelihoodFieldParams(), make_grid(data, 0.5))
        occ = likelihood_field_as_occupancy(field)
        assert occ.dtype == np.int8
        assert occ.max() == 100 and occ.min() >= 0
        assert occ[5, 5] == 100  # the obstacle cell is the peak

    def test_particle_markers_grouping(self):
        xyt = np.array([[0.0, 0.0, 0.0], [0.01, 0.0, 0.0], [5.0, 5.0, 1.0]])
        w = np.array([1.0, 1.0, 2.0])
        poses, scales = particle_markers(xyt, w, resolution=0.1)
        assert len(poses) == 2
        np.testing.assert_allclose(sorted(scales), [0.5, 0.5])

    def test_resampled_pose_array(self):
        xyt = jnp.asarray([[0.0, 0.0, 0.0], [9.0, 9.0, 0.0]])
        w = jnp.asarray([1.0, 0.0])
        out = resampled_pose_array(jax.random.PRNGKey(0), xyt, w, 16)
        np.testing.assert_allclose(np.asarray(out), np.zeros((16, 3)))
