"""Motion-model moment tests and estimation tests.

Statistical components are tested by sampling with fixed PRNG keys and
asserting moments, mirroring the reference strategy
(beluga/test/beluga/motion/test_differential_drive_model.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.algorithms.estimation import estimate_se2, estimate_se3, estimate_vector
from beluga_tpu.lie import SE2, SE3, SO2, SO3
from beluga_tpu.models.motion.differential_drive import (
    DifferentialDriveParams,
    diff_drive_propagate,
)
from beluga_tpu.models.motion.omnidirectional import (
    OmnidirectionalDriveParams,
    omni_drive_propagate,
)
from beluga_tpu.models.motion.stationary import stationary_propagate

N = 50_000


def repeated(pose, n=N):
    return SE2(jnp.broadcast_to(pose.xy, (n, 2)), SO2(jnp.broadcast_to(pose.rot.z, (n, 2))))


class TestDifferentialDrive:
    def test_no_motion_no_noise(self):
        # zero odometry delta with zero alphas -> states unchanged
        params = DifferentialDriveParams(0.0, 0.0, 0.0, 0.0)
        states = repeated(SE2.from_xytheta(1.0, 2.0, 0.5), 100)
        pose = SE2.from_xytheta(3.0, 3.0, 1.0)
        out = diff_drive_propagate(params, jax.random.PRNGKey(0), states, pose, pose)
        np.testing.assert_allclose(out.xy, states.xy, atol=1e-6)
        np.testing.assert_allclose(out.theta, states.theta, atol=1e-6)

    def test_translation_applied_deterministically(self):
        # forward translation along +x with zero noise
        params = DifferentialDriveParams(0.0, 0.0, 0.0, 0.0)
        states = repeated(SE2.identity(), 10)
        prev = SE2.identity()
        cur = SE2.from_xytheta(1.0, 0.0, 0.0)
        out = diff_drive_propagate(params, jax.random.PRNGKey(0), states, cur, prev)
        np.testing.assert_allclose(out.x, 1.0, atol=1e-6)
        np.testing.assert_allclose(out.y, 0.0, atol=1e-6)
        np.testing.assert_allclose(out.theta, 0.0, atol=1e-6)

    def test_translation_in_body_frame(self):
        # particle facing +y: odometry forward motion moves it along +y
        params = DifferentialDriveParams(0.0, 0.0, 0.0, 0.0)
        states = repeated(SE2.from_xytheta(0.0, 0.0, np.pi / 2), 10)
        prev = SE2.identity()
        cur = SE2.from_xytheta(1.0, 0.0, 0.0)
        out = diff_drive_propagate(params, jax.random.PRNGKey(0), states, cur, prev)
        np.testing.assert_allclose(out.x, 0.0, atol=1e-5)
        np.testing.assert_allclose(out.y, 1.0, atol=1e-5)

    def test_rotation_decomposition(self):
        # diagonal move with heading change: rot1-trans-rot2 composition
        params = DifferentialDriveParams(0.0, 0.0, 0.0, 0.0)
        states = repeated(SE2.identity(), 10)
        prev = SE2.identity()
        cur = SE2.from_xytheta(1.0, 1.0, np.pi / 2)
        out = diff_drive_propagate(params, jax.random.PRNGKey(0), states, cur, prev)
        np.testing.assert_allclose(out.x, 1.0, atol=1e-5)
        np.testing.assert_allclose(out.y, 1.0, atol=1e-5)
        np.testing.assert_allclose(out.theta, np.pi / 2, atol=1e-5)

    def test_translation_noise_moments(self):
        # alpha3 only: var(trans) = a3 * d^2 along the motion direction
        a3 = 0.2
        params = DifferentialDriveParams(0.0, 0.0, a3, 0.0)
        states = repeated(SE2.identity())
        prev = SE2.identity()
        cur = SE2.from_xytheta(2.0, 0.0, 0.0)
        out = diff_drive_propagate(params, jax.random.PRNGKey(1), states, cur, prev)
        xs = np.asarray(out.x)
        assert xs.mean() == pytest.approx(2.0, abs=0.02)
        assert xs.var() == pytest.approx(a3 * 4.0, rel=0.05)
        np.testing.assert_allclose(np.asarray(out.y).var(), 0.0, atol=1e-6)

    def test_rotation_noise_moments(self):
        # pure rotation: var(rot1 + rot2) where each has a1 * (theta_i)^2
        a1 = 0.1
        params = DifferentialDriveParams(a1, 0.0, 0.0, 0.0)
        states = repeated(SE2.identity())
        prev = SE2.identity()
        cur = SE2.from_xytheta(0.0, 0.0, 1.0)  # in-place rotation
        out = diff_drive_propagate(params, jax.random.PRNGKey(2), states, cur, prev)
        thetas = np.asarray(out.theta)
        assert thetas.mean() == pytest.approx(1.0, abs=0.02)
        # first_rotation = 0 (below distance threshold), second = 1.0
        assert thetas.var() == pytest.approx(a1 * 1.0, rel=0.05)

    def test_backward_motion_symmetric_noise(self):
        # reverse move: rotation variance uses min(|θ|, |θ−π|)^2, so a pure
        # backward translation generates no rotation noise from alpha1
        params = DifferentialDriveParams(0.5, 0.0, 0.0, 0.0)
        states = repeated(SE2.identity())
        prev = SE2.identity()
        cur = SE2.from_xytheta(-2.0, 0.0, 0.0)  # straight backwards
        out = diff_drive_propagate(params, jax.random.PRNGKey(3), states, cur, prev)
        # first rotation is pi (heading backwards), flipped variance is 0
        np.testing.assert_allclose(np.asarray(out.theta).var(), 0.0, atol=1e-5)


class TestOmnidirectional:
    def test_strafe_noise(self):
        a5 = 0.3
        params = OmnidirectionalDriveParams(0.0, 0.0, 0.0, 0.0, a5)
        states = repeated(SE2.identity())
        prev = SE2.identity()
        cur = SE2.from_xytheta(1.0, 0.0, 0.0)
        out = omni_drive_propagate(params, jax.random.PRNGKey(0), states, cur, prev)
        assert np.asarray(out.y).var() == pytest.approx(a5 * 1.0, rel=0.05)
        np.testing.assert_allclose(np.asarray(out.x), 1.0, atol=1e-5)

    def test_deterministic_motion(self):
        params = OmnidirectionalDriveParams(0.0, 0.0, 0.0, 0.0, 0.0)
        states = repeated(SE2.from_xytheta(1.0, 1.0, np.pi / 2), 10)
        prev = SE2.identity()
        cur = SE2.from_xytheta(1.0, 0.0, 0.3)
        out = omni_drive_propagate(params, jax.random.PRNGKey(0), states, cur, prev)
        # body-frame forward motion rotated by particle heading
        np.testing.assert_allclose(out.x, 1.0, atol=1e-5)
        np.testing.assert_allclose(out.y, 2.0, atol=1e-5)
        np.testing.assert_allclose(out.theta, np.pi / 2 + 0.3, atol=1e-5)


class TestStationary:
    def test_moments(self):
        states = repeated(SE2.from_xytheta(5.0, -3.0, 0.0))
        out = stationary_propagate(jax.random.PRNGKey(0), states)
        assert np.asarray(out.x).mean() == pytest.approx(5.0, abs=0.001)
        assert np.asarray(out.x).std() == pytest.approx(0.02, rel=0.05)
        assert np.asarray(out.theta).std() == pytest.approx(0.02, rel=0.05)


class TestEstimation:
    def test_se2_uniform_weights(self):
        rng = np.random.default_rng(0)
        xy = rng.normal([1.0, 2.0], 0.1, size=(5000, 2))
        theta = rng.normal(0.5, 0.05, size=5000)
        states = SE2.from_xytheta(
            jnp.asarray(xy[:, 0], jnp.float32),
            jnp.asarray(xy[:, 1], jnp.float32),
            jnp.asarray(theta, jnp.float32),
        )
        mean, cov = estimate_se2(states, jnp.ones(5000))
        np.testing.assert_allclose(mean.xy, [1.0, 2.0], atol=0.01)
        assert float(mean.theta) == pytest.approx(0.5, abs=0.01)
        assert float(cov[0, 0]) == pytest.approx(0.01, rel=0.1)
        assert float(cov[1, 1]) == pytest.approx(0.01, rel=0.1)
        # circular yaw variance approximates sigma^2 for small sigma
        assert float(cov[2, 2]) == pytest.approx(0.0025, rel=0.1)

    def test_se2_weighted(self):
        # two particle groups; all weight on the first
        states = SE2.from_xytheta(
            jnp.asarray([0.0, 10.0]), jnp.asarray([0.0, 10.0]), jnp.asarray([0.0, 3.0])
        )
        mean, _ = estimate_se2(states, jnp.asarray([1.0, 1e-6]))
        np.testing.assert_allclose(mean.xy, [0.0, 0.0], atol=1e-4)

    def test_se2_degenerate_rotation(self):
        # two opposite headings cancel: yaw 0, infinite yaw variance
        # (estimation.hpp:460-466)
        states = SE2.from_xytheta(jnp.zeros(2), jnp.zeros(2), jnp.asarray([0.0, np.pi]))
        mean, cov = estimate_se2(states, jnp.ones(2))
        assert float(mean.theta) == 0.0
        assert np.isinf(float(cov[2, 2]))

    def test_se2_masked(self):
        states = SE2.from_xytheta(
            jnp.asarray([1.0, 1.0, 99.0]), jnp.zeros(3), jnp.zeros(3)
        )
        mean, _ = estimate_se2(states, jnp.ones(3), mask=jnp.asarray([True, True, False]))
        assert float(mean.x) == pytest.approx(1.0)

    def test_vector_estimate_bias_correction(self):
        # matches the reference 1/(1-sum w^2) correction: for n uniform
        # weights this is the standard n/(n-1) Bessel correction
        vals = jnp.asarray([[1.0], [2.0], [3.0], [4.0]])
        _, cov = estimate_vector(vals, jnp.ones(4))
        np.testing.assert_allclose(cov[0, 0], np.var([1, 2, 3, 4], ddof=1), rtol=1e-5)

    def test_se3_estimate(self):
        rng = np.random.default_rng(1)
        xyz = rng.normal([1.0, 2.0, 3.0], 0.1, size=(2000, 3)).astype(np.float32)
        w = rng.normal([0.0, 0.0, 0.5], 0.05, size=(2000, 3)).astype(np.float32)
        states = SE3(jnp.asarray(xyz), SO3.exp(jnp.asarray(w)))
        mean, cov = estimate_se3(states, jnp.ones(2000))
        np.testing.assert_allclose(mean.xyz, [1.0, 2.0, 3.0], atol=0.02)
        np.testing.assert_allclose(mean.rot.log(), [0.0, 0.0, 0.5], atol=0.02)
        assert float(cov[0, 0]) == pytest.approx(0.01, rel=0.15)
        assert float(cov[5, 5]) == pytest.approx(0.0025, rel=0.15)
