"""NDT map + sensor model tests.

Golden values from beluga/test/beluga/sensor/test_ndt_model.cpp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.lie import SE2, SE3, SO3
from beluga_tpu.maps.ndt import load_ndt_hdf5, make_ndt_map
from beluga_tpu.models.sensor.ndt import (
    NdtModelParams,
    fit_measurement_cells,
    ndt_likelihood_at,
    ndt_weights_2d,
    ndt_weights_3d,
)

TURTLEBOT_NDT = "/root/reference/beluga/test/beluga/test_data/turtlebot3_world.hdf5"
SAMPLE_3D_NDT = "/root/reference/beluga/test/beluga/test_data/sample_3d_ndt_map.hdf5"


def two_cell_map():
    """Map from test_ndt_model.cpp Likelihoood test."""
    cells = [[0, 0], [1, 1]]
    means = [[0.5, 0.5], [1.5, 1.5]]
    covs = [[[0.5, 0.0], [0.0, 0.3]], [[0.5, 0.0], [0.0, 0.5]]]
    return make_ndt_map(cells, means, covs, 1.0)


DIAG_COV = np.diag([0.5, 0.5]).astype(np.float32)


class TestNdtMap:
    def test_lookup(self):
        m = two_cell_map()
        idx, found = m.lookup(jnp.asarray([[0, 0], [1, 1], [5, 5], [-3, 2]]))
        np.testing.assert_array_equal(found, [True, True, False, False])
        np.testing.assert_allclose(m.means[idx[0]], [0.5, 0.5])
        np.testing.assert_allclose(m.means[idx[1]], [1.5, 1.5])

    def test_negative_cells(self):
        m = make_ndt_map([[-5, -7]], [[-2.2, -3.2]], [np.eye(2) * 0.1], 0.5)
        idx, found = m.lookup(jnp.asarray([[-5, -7], [5, 7]]))
        assert bool(found[0]) and not bool(found[1])

    def test_load_turtlebot_hdf5(self):
        m = load_ndt_hdf5(TURTLEBOT_NDT)
        assert m.dim == 2
        assert int(m.num_cells) > 10
        assert float(m.resolution) > 0

    def test_load_3d_hdf5(self):
        m = load_ndt_hdf5(SAMPLE_3D_NDT)
        assert m.dim == 3
        assert int(m.num_cells) > 10


class TestNdtModel2d:
    """Golden values from test_ndt_model.cpp (MinLikelihood / Likelihoood)."""

    def test_min_likelihood_empty_map(self):
        m = make_ndt_map(np.zeros((0, 2)), np.zeros((0, 2)), np.zeros((0, 2, 2)), 0.5)
        params = NdtModelParams(minimum_likelihood=1e-6)
        for p in [[0.1, 0.1], [0.5, 0.5], [0.75, 0.75]]:
            lik = ndt_likelihood_at(params, m, jnp.asarray(p, jnp.float32), jnp.asarray(DIAG_COV))
            assert float(lik) == pytest.approx(1e-6)

    @pytest.mark.parametrize(
        "point,expected",
        [
            ([0.5, 0.5], 1.3678794411714423),
            ([0.8, 0.5], 1.4307317817730123),
            ([0.5, 0.8], 1.4200370805919718),
            ([1.5, 1.5], 1.3246524673583497),
            ([1.8, 1.5], 1.1859229670198237),
            ([1.5, 1.8], 1.1669230426687498),
        ],
    )
    def test_likelihood_golden(self, point, expected):
        m = two_cell_map()
        params = NdtModelParams(minimum_likelihood=1e-6)
        lik = ndt_likelihood_at(params, m, jnp.asarray(point, jnp.float32), jnp.asarray(DIAG_COV))
        assert float(lik) == pytest.approx(expected, rel=1e-5)

    def test_fit_points_mean(self):
        pts = jnp.asarray([[0.1, 0.2]] * 6, jnp.float32)
        mask = jnp.ones(6, bool)
        means, covs, cmask = fit_measurement_cells(pts, mask, jnp.float32(0.5))
        i = int(jnp.argmax(cmask))
        np.testing.assert_allclose(means[i], [0.1, 0.2], atol=1e-6)
        assert float(covs[i, 0, 0]) >= 1e-5 * (1 - 1e-4)  # min variance clamp (f32)

    def test_fit_points_variance_direction(self):
        pts = jnp.asarray(
            [[0.1, 0.2], [0.1, 0.9], [0.1, 0.2], [0.1, 0.9], [0.1, 0.2], [0.1, 0.2]],
            jnp.float32,
        )
        # all in one cell at resolution 1.0
        means, covs, cmask = fit_measurement_cells(pts, jnp.ones(6, bool), jnp.float32(1.0))
        i = int(jnp.argmax(cmask))
        np.testing.assert_allclose(means[i], [0.1, 0.433333], atol=1e-5)
        assert float(covs[i, 1, 1]) > float(covs[i, 0, 0])

    def test_to_cells_not_enough_points(self):
        pts = jnp.asarray([[0.1, 0.2], [0.112, 0.22], [0.15, 0.23]], jnp.float32)
        _, _, cmask = fit_measurement_cells(pts, jnp.ones(3, bool), jnp.float32(0.5))
        assert not bool(cmask.any())

    def test_weights_prefer_true_pose(self):
        m = two_cell_map()
        params = NdtModelParams(minimum_likelihood=1e-6)
        # measurement Gaussians match the map when the state is identity
        meas_means = jnp.asarray([[0.5, 0.5], [1.5, 1.5]], jnp.float32)
        meas_covs = jnp.asarray([np.eye(2) * 0.1] * 2, jnp.float32)
        cmask = jnp.ones(2, bool)
        states = SE2.from_xytheta(
            jnp.asarray([0.0, 3.0]), jnp.asarray([0.0, 3.0]), jnp.zeros(2)
        )
        w = ndt_weights_2d(params, m, states, meas_means, meas_covs, cmask)
        assert float(w[0]) > float(w[1])
        assert float(w[1]) == pytest.approx(1.0 + 2e-6, abs=1e-7)

    def test_full_pipeline_on_turtlebot_map(self):
        m = load_ndt_hdf5(TURTLEBOT_NDT)
        params = NdtModelParams(minimum_likelihood=1e-6, d1=1.0, d2=1.0)
        # synthesize a measurement from map cells themselves: particle at
        # identity should score higher than a far-away particle
        k = min(20, int(m.num_cells))
        meas_means = m.means[:k]
        meas_covs = m.covs[:k]
        cmask = jnp.ones(k, bool)
        states = SE2.from_xytheta(
            jnp.asarray([0.0, 50.0]), jnp.asarray([0.0, 50.0]), jnp.zeros(2)
        )
        w = ndt_weights_2d(params, m, states, meas_means, meas_covs, cmask)
        assert float(w[0]) > float(w[1])


class TestNdtModel3d:
    def test_weights_3d(self):
        cells = [[0, 0, 0], [1, 1, 1]]
        means = [[0.5, 0.5, 0.5], [1.5, 1.5, 1.5]]
        covs = [np.eye(3) * 0.3, np.eye(3) * 0.3]
        m = make_ndt_map(cells, means, covs, 1.0)
        params = NdtModelParams(minimum_likelihood=1e-6)

        meas_means = jnp.asarray(means, jnp.float32)
        meas_covs = jnp.asarray([np.eye(3) * 0.1] * 2, jnp.float32)
        cmask = jnp.ones(2, bool)
        good = SE3.identity((1,))
        states = SE3(
            jnp.concatenate([good.xyz, jnp.asarray([[5.0, 5.0, 5.0]])]),
            SO3(jnp.concatenate([good.rot.q, SO3.identity((1,)).q])),
        )
        w = ndt_weights_3d(params, m, states, meas_means, meas_covs, cmask)
        assert float(w[0]) > float(w[1])

    def test_3d_map_pipeline(self):
        m = load_ndt_hdf5(SAMPLE_3D_NDT)
        params = NdtModelParams(minimum_likelihood=1e-6)
        k = min(10, int(m.num_cells))
        states = SE3.identity((1,))
        w = ndt_weights_3d(
            params, m, states, m.means[:k], m.covs[:k], jnp.ones(k, bool)
        )
        assert np.isfinite(float(w[0]))
        assert float(w[0]) > 1.0


def test_lookup_gaussians_onehot_matches_gather():
    """The TPU one-hot probe reproduces searchsorted+gather (CPU check)."""
    from beluga_tpu.maps.ndt import make_ndt_map

    rng = np.random.default_rng(0)
    cells = rng.integers(-40, 40, (60, 2)).astype(np.int32)
    cells = np.unique(cells, axis=0)
    m = cells.shape[0]
    means = rng.standard_normal((m, 2)).astype(np.float32)
    covs = np.einsum("mab,mcb->mac",
                     rng.standard_normal((m, 2, 2)).astype(np.float32),
                     rng.standard_normal((m, 2, 2)).astype(np.float32))
    covs += 0.1 * np.eye(2, dtype=np.float32)
    nm = make_ndt_map(cells, means, covs, 0.5)

    q = jnp.asarray(rng.integers(-42, 42, (9, 7, 2)), jnp.int32)
    gm, gc, gf = nm.lookup_gaussians(q)            # gather path on CPU
    om, oc, of = nm._lookup_gaussians_onehot(q)    # force the one-hot path
    np.testing.assert_array_equal(np.asarray(of), np.asarray(gf))
    np.testing.assert_allclose(
        np.asarray(om)[np.asarray(of)], np.asarray(gm)[np.asarray(gf)], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(oc)[np.asarray(of)], np.asarray(gc)[np.asarray(gf)], atol=1e-4)


def test_dense_and_probe_kernel_paths_agree():
    """The small-map dense cross-evaluation equals the per-offset probe
    path (same stencil, same per-pair math) for 2D and 3D."""
    import beluga_tpu.models.sensor.ndt as ndt_mod
    from beluga_tpu.maps.ndt import make_ndt_map
    from beluga_tpu.models.sensor.ndt import (
        KERNEL_2D, KERNEL_3D, NdtModelParams, _kernel_likelihood,
        _kernel_likelihood_dense)

    rng = np.random.default_rng(0)
    params = NdtModelParams()
    for d, kern in ((2, KERNEL_2D), (3, KERNEL_3D)):
        cells = rng.integers(-6, 6, (40, d))
        cells = np.unique(cells, axis=0)
        means = (cells + rng.uniform(0.2, 0.8, cells.shape)) * 0.5
        covs = np.broadcast_to(np.eye(d) * 0.02, (len(cells), d, d))
        nm = make_ndt_map(cells, means, covs, 0.5)
        q_mean = jnp.asarray(
            rng.uniform(-3, 3, (25, d)).astype(np.float32))
        q_cov = jnp.broadcast_to(
            jnp.eye(d, dtype=jnp.float32) * 0.01, (25, d, d))
        dense = _kernel_likelihood_dense(nm, params, q_mean, q_cov)
        orig = ndt_mod._DENSE_MAX_CELLS
        try:
            ndt_mod._DENSE_MAX_CELLS = 0  # force the probe path
            probe = _kernel_likelihood(nm, params, q_mean, q_cov, kern)
        finally:
            ndt_mod._DENSE_MAX_CELLS = orig
        np.testing.assert_allclose(
            np.asarray(dense), np.asarray(probe), rtol=1e-5, atol=1e-8,
            err_msg=f"d={d}")
        assert float(jnp.max(dense)) > 0.0  # some queries actually match


def test_dense_3d_singular_covariance_not_max_likelihood():
    """Planar NDT cells (rank-deficient covariance) summed with a
    measurement covariance degenerate in the same direction must not
    collapse the dense quadratic form to zero (max likelihood for
    arbitrarily wrong particles) — regression for the unjittered
    adjugate."""
    from beluga_tpu.maps.ndt import make_ndt_map
    from beluga_tpu.models.sensor.ndt import (
        KERNEL_3D, NdtModelParams, _kernel_likelihood_dense)

    params = NdtModelParams()
    cells = np.asarray([[0, 0, 0]], np.int32)
    means = np.asarray([[0.25, 0.25, 0.25]], np.float32)
    covs = np.asarray([np.diag([0.04, 0.04, 0.0])], np.float32)  # planar
    nm = make_ndt_map(cells, means, covs, 0.5)
    q_mean = jnp.asarray([[0.30, 0.20, 0.25]], jnp.float32)  # 7 cm off
    q_cov = jnp.asarray([np.diag([0.01, 0.01, 0.0])], jnp.float32)
    lik = float(_kernel_likelihood_dense(nm, params, q_mean, q_cov)[0])
    assert np.isfinite(lik)
    assert lik < 0.99 * params.d1, lik  # not the no-error maximum
    # and the in-plane error is what it scores: exp(-0.5 * 0.005/0.05)
    assert abs(lik - np.exp(-0.5 * (0.05**2 + 0.05**2) / 0.05)) < 5e-3
