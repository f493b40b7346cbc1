"""Unit tests for the Lie-group substrate (reference tier-1 analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.lie import SE2, SE3, SO2, SO3, to_2d, to_3d


def rng(seed=0):
    return np.random.default_rng(seed)


class TestSO2:
    def test_exp_log_roundtrip(self):
        theta = jnp.linspace(-3.1, 3.1, 25)
        np.testing.assert_allclose(SO2.exp(theta).log(), theta, atol=1e-6)

    def test_compose_matches_angle_sum(self):
        a, b = 0.7, -1.2
        c = SO2.exp(jnp.asarray(a)) @ SO2.exp(jnp.asarray(b))
        np.testing.assert_allclose(c.log(), a + b, atol=1e-6)

    def test_act_rotates(self):
        r = SO2.exp(jnp.asarray(np.pi / 2))
        v = r.act(jnp.asarray([1.0, 0.0]))
        np.testing.assert_allclose(v, [0.0, 1.0], atol=1e-6)

    def test_inverse(self):
        r = SO2.exp(jnp.asarray(0.4))
        np.testing.assert_allclose((r @ r.inverse()).log(), 0.0, atol=1e-6)


class TestSE2:
    def test_identity_compose(self):
        g = SE2.from_xytheta(1.0, 2.0, 0.5)
        h = g @ SE2.identity()
        np.testing.assert_allclose(h.as_xytheta(), g.as_xytheta(), atol=1e-6)

    def test_inverse(self):
        g = SE2.from_xytheta(1.0, -2.0, 0.8)
        e = g @ g.inverse()
        np.testing.assert_allclose(e.as_xytheta(), [0, 0, 0], atol=1e-6)

    def test_exp_log_roundtrip(self):
        t = jnp.asarray([[0.5, -0.2, 0.9], [0.0, 0.0, 0.0], [1.0, 1.0, -2.5]])
        np.testing.assert_allclose(SE2.exp(t).log(), t, atol=1e-5)

    def test_act_point(self):
        g = SE2.from_xytheta(1.0, 0.0, np.pi / 2)
        p = g.act(jnp.asarray([1.0, 0.0]))
        np.testing.assert_allclose(p, [1.0, 1.0], atol=1e-6)

    def test_batched(self):
        xyt = jnp.asarray(rng().normal(size=(100, 3)), jnp.float32)
        g = SE2.from_xytheta(xyt)
        assert g.shape == (100,)
        composed = g @ g.inverse()
        np.testing.assert_allclose(composed.xy, np.zeros((100, 2)), atol=1e-5)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = jnp.asarray(rng().normal(size=(50, 3)) * 1.0, jnp.float32)
        np.testing.assert_allclose(SO3.exp(w).log(), w, atol=1e-4)

    def test_compose_vs_matrix(self):
        w1 = jnp.asarray([0.1, 0.2, 0.3])
        w2 = jnp.asarray([-0.2, 0.4, 0.1])
        r = SO3.exp(w1) @ SO3.exp(w2)
        m = SO3.exp(w1).as_matrix() @ SO3.exp(w2).as_matrix()
        np.testing.assert_allclose(r.as_matrix(), m, atol=1e-5)

    def test_act_matches_matrix(self):
        w = jnp.asarray([0.3, -0.5, 0.7])
        v = jnp.asarray([1.0, 2.0, 3.0])
        np.testing.assert_allclose(
            SO3.exp(w).act(v), SO3.exp(w).as_matrix() @ v, atol=1e-5
        )

    def test_rpy_roundtrip(self):
        r, p, y = 0.2, -0.3, 1.1
        rot = SO3.from_rpy(jnp.asarray(r), jnp.asarray(p), jnp.asarray(y))
        rr, pp, yy = rot.rpy()
        np.testing.assert_allclose([rr, pp, yy], [r, p, y], atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        t = jnp.asarray(rng().normal(size=(20, 6)) * 0.8, jnp.float32)
        np.testing.assert_allclose(SE3.exp(t).log(), t, atol=1e-4)

    def test_inverse(self):
        g = SE3.exp(jnp.asarray([0.5, -0.2, 0.9, 0.1, 0.4, -0.3]))
        e = g @ g.inverse()
        np.testing.assert_allclose(e.xyz, np.zeros(3), atol=1e-5)
        np.testing.assert_allclose(e.rot.log(), np.zeros(3), atol=1e-5)


class TestEmbedding:
    def test_roundtrip(self):
        g = SE2.from_xytheta(1.0, 2.0, 0.7)
        back = to_2d(to_3d(g))
        np.testing.assert_allclose(back.as_xytheta(), g.as_xytheta(), atol=1e-5)

    def test_to_3d_z_zero(self):
        g3 = to_3d(SE2.from_xytheta(1.0, 2.0, 0.7))
        np.testing.assert_allclose(g3.xyz[..., 2], 0.0, atol=1e-7)
