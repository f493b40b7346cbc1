"""Batched Lie-group primitives (SO2 / SE2 / SO3 / SE3) over dense JAX arrays.

This is the math substrate of the framework (the analog of Sophus in the
reference, see SURVEY.md L0).  Unlike Sophus — which represents one group
element per object — every type here is an array-of-structures-of-arrays:
each field carries arbitrary leading batch dimensions, so a particle cloud of
one million SE2 poses is just ``SE2(xy=f32[1_000_000, 2], rot=f32[1_000_000,
2])``.  All operations are pure `jnp` functions and therefore compose with
``jit`` / ``vmap`` / ``shard_map``.

Representation choices (TPU-first):
  * SO2 as a unit complex number ``(cos θ, sin θ)`` — composition is a
    2-term multiply-add, no trig in the hot path (the reference makes the
    same choice via ``Sophus::SO2::unit_complex``).
  * SO3 as a unit quaternion ``(w, x, y, z)``.
  * float32 everywhere by default; TPU f64 is emulated and slow.

Reference behavior mirrored from Sophus usage in
/root/reference/beluga (e.g. ``motion/differential_drive_model.hpp``,
``algorithm/estimation.hpp``); this file is an independent implementation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _dc(cls):
    """Register a frozen dataclass as a JAX pytree with all fields as leaves."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


# ---------------------------------------------------------------------------
# SO2
# ---------------------------------------------------------------------------


@_dc
class SO2:
    """Planar rotation as a unit complex number, shape ``[..., 2] = (cos, sin)``."""

    z: Array  # [..., 2]

    @property
    def cos(self) -> Array:
        return self.z[..., 0]

    @property
    def sin(self) -> Array:
        return self.z[..., 1]

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "SO2":
        z = jnp.broadcast_to(jnp.asarray([1.0, 0.0], dtype), (*shape, 2))
        return SO2(z)

    @staticmethod
    def exp(theta: Array) -> "SO2":
        return SO2(jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1))

    def log(self) -> Array:
        """Rotation angle in (-pi, pi]."""
        return jnp.arctan2(self.sin, self.cos)

    def __matmul__(self, other):
        if isinstance(other, SO2):
            c = self.cos * other.cos - self.sin * other.sin
            s = self.sin * other.cos + self.cos * other.sin
            return SO2(jnp.stack([c, s], axis=-1))
        return self.act(other)

    def act(self, v: Array) -> Array:
        """Rotate 2D points ``v`` of shape ``[..., 2]``."""
        x = self.cos * v[..., 0] - self.sin * v[..., 1]
        y = self.sin * v[..., 0] + self.cos * v[..., 1]
        return jnp.stack([x, y], axis=-1)

    def inverse(self) -> "SO2":
        return SO2(jnp.stack([self.cos, -self.sin], axis=-1))

    def normalized(self) -> "SO2":
        n = jnp.linalg.norm(self.z, axis=-1, keepdims=True)
        return SO2(self.z / n)

    @staticmethod
    def sample_uniform(key: Array, shape=(), dtype=jnp.float32) -> "SO2":
        theta = jax.random.uniform(key, shape, dtype, -jnp.pi, jnp.pi)
        return SO2.exp(theta)

    @property
    def shape(self):
        return self.z.shape[:-1]


# ---------------------------------------------------------------------------
# SE2
# ---------------------------------------------------------------------------


@_dc
class SE2:
    """Planar rigid transform: translation ``xy [..., 2]`` + rotation ``rot``."""

    xy: Array  # [..., 2]
    rot: SO2

    @property
    def x(self) -> Array:
        return self.xy[..., 0]

    @property
    def y(self) -> Array:
        return self.xy[..., 1]

    @property
    def theta(self) -> Array:
        return self.rot.log()

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "SE2":
        return SE2(jnp.zeros((*shape, 2), dtype), SO2.identity(shape, dtype))

    @staticmethod
    def from_xytheta(x, y=None, theta=None) -> "SE2":
        """From ``[..., 3]`` array or three broadcastable components."""
        if y is None:
            arr = jnp.asarray(x, dtype=jnp.float32)
            x, y, theta = arr[..., 0], arr[..., 1], arr[..., 2]
        x, y, theta = (jnp.asarray(a, dtype=jnp.float32) for a in (x, y, theta))
        x, y, theta = jnp.broadcast_arrays(x, y, theta)
        return SE2(jnp.stack([x, y], axis=-1), SO2.exp(theta))

    def as_xytheta(self) -> Array:
        return jnp.concatenate([self.xy, self.theta[..., None]], axis=-1)

    def __matmul__(self, other):
        if isinstance(other, SE2):
            return SE2(self.xy + self.rot.act(other.xy), self.rot @ other.rot)
        return self.act(other)

    def act(self, p: Array) -> Array:
        """Transform 2D points ``p`` of shape ``[..., 2]``."""
        return self.rot.act(p) + self.xy

    def inverse(self) -> "SE2":
        rinv = self.rot.inverse()
        return SE2(-rinv.act(self.xy), rinv)

    def log(self) -> Array:
        """Tangent vector ``[..., 3] = (vx, vy, omega)`` (Sophus convention)."""
        theta = self.theta
        half = 0.5 * theta
        # V^{-1} = [[a, b], [-b, a]] with a = half*cot(half), b = half
        small = jnp.abs(theta) < 1e-5
        cot_term = jnp.where(
            small,
            1.0 - theta * theta / 12.0,
            half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half) + 1e-30),
        )
        a = jnp.where(small, cot_term, half / jnp.tan(jnp.where(small, 1.0, half)))
        b = half
        vx = a * self.x + b * self.y
        vy = -b * self.x + a * self.y
        return jnp.stack([vx, vy, theta], axis=-1)

    @staticmethod
    def exp(tangent: Array) -> "SE2":
        """Exponential map from ``[..., 3] = (vx, vy, omega)``."""
        vx, vy, theta = tangent[..., 0], tangent[..., 1], tangent[..., 2]
        small = jnp.abs(theta) < 1e-5
        theta_safe = jnp.where(small, 1.0, theta)
        sin_over = jnp.where(small, 1.0 - theta * theta / 6.0, jnp.sin(theta_safe) / theta_safe)
        one_minus_cos_over = jnp.where(
            small, theta / 2.0, (1.0 - jnp.cos(theta_safe)) / theta_safe
        )
        x = sin_over * vx - one_minus_cos_over * vy
        y = one_minus_cos_over * vx + sin_over * vy
        return SE2(jnp.stack([x, y], axis=-1), SO2.exp(theta))

    @property
    def shape(self):
        return self.xy.shape[:-1]

    def reshape(self, *shape) -> "SE2":
        return SE2(self.xy.reshape(*shape, 2), SO2(self.rot.z.reshape(*shape, 2)))


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------


@_dc
class SO3:
    """3D rotation as a unit quaternion ``[..., 4] = (w, x, y, z)``."""

    q: Array

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "SO3":
        q = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype), (*shape, 4))
        return SO3(q)

    @staticmethod
    def from_quat_wxyz(q: Array) -> "SO3":
        return SO3(q / jnp.linalg.norm(q, axis=-1, keepdims=True))

    @staticmethod
    def exp(w: Array) -> "SO3":
        """Exponential map from rotation vectors ``[..., 3]``."""
        angle = jnp.linalg.norm(w, axis=-1, keepdims=True)
        small = angle < 1e-6
        angle_safe = jnp.where(small, 1.0, angle)
        half = 0.5 * angle
        sinc_half = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(half) / angle_safe)
        qw = jnp.cos(half)
        qxyz = sinc_half * w
        return SO3(jnp.concatenate([qw, qxyz], axis=-1))

    def log(self) -> Array:
        """Rotation vector ``[..., 3]``."""
        qw = self.q[..., :1]
        qv = self.q[..., 1:]
        # make w >= 0 for the shortest arc
        sign = jnp.where(qw < 0, -1.0, 1.0)
        qw, qv = qw * sign, qv * sign
        norm_v = jnp.linalg.norm(qv, axis=-1, keepdims=True)
        small = norm_v < 1e-6
        norm_safe = jnp.where(small, 1.0, norm_v)
        angle = 2.0 * jnp.arctan2(norm_v, qw)
        scale = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-6), angle / norm_safe)
        return scale * qv

    def __matmul__(self, other):
        if isinstance(other, SO3):
            w1, x1, y1, z1 = (self.q[..., i] for i in range(4))
            w2, x2, y2, z2 = (other.q[..., i] for i in range(4))
            return SO3(
                jnp.stack(
                    [
                        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
                    ],
                    axis=-1,
                )
            )
        return self.act(other)

    def act(self, v: Array) -> Array:
        """Rotate 3D points ``v`` of shape ``[..., 3]``."""
        qw = self.q[..., :1]
        qv = self.q[..., 1:]
        t = 2.0 * jnp.cross(qv, v)
        return v + qw * t + jnp.cross(qv, t)

    def inverse(self) -> "SO3":
        return SO3(self.q * jnp.asarray([1.0, -1.0, -1.0, -1.0], self.q.dtype))

    def normalized(self) -> "SO3":
        return SO3(self.q / jnp.linalg.norm(self.q, axis=-1, keepdims=True))

    def as_matrix(self) -> Array:
        w, x, y, z = (self.q[..., i] for i in range(4))
        r = jnp.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
            ],
            axis=-1,
        )
        return r.reshape(*r.shape[:-1], 3, 3)

    @staticmethod
    def from_rpy(roll, pitch, yaw) -> "SO3":
        """Extrinsic XYZ (roll-pitch-yaw) Euler angles."""
        return SO3.exp(jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], -1)) @ (
            SO3.exp(jnp.stack([jnp.zeros_like(pitch), pitch, jnp.zeros_like(pitch)], -1))
            @ SO3.exp(jnp.stack([roll, jnp.zeros_like(roll), jnp.zeros_like(roll)], -1))
        )

    def rpy(self) -> tuple[Array, Array, Array]:
        """Extrinsic XYZ euler angles (roll, pitch, yaw) from the matrix."""
        m = self.as_matrix()
        pitch = jnp.arcsin(jnp.clip(-m[..., 2, 0], -1.0, 1.0))
        roll = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
        yaw = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
        return roll, pitch, yaw

    @staticmethod
    def sample_uniform(key: Array, shape=(), dtype=jnp.float32) -> "SO3":
        q = jax.random.normal(key, (*shape, 4), dtype)
        return SO3.from_quat_wxyz(q)

    @property
    def shape(self):
        return self.q.shape[:-1]


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------


@_dc
class SE3:
    """3D rigid transform: translation ``xyz [..., 3]`` + rotation ``rot``."""

    xyz: Array
    rot: SO3

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "SE3":
        return SE3(jnp.zeros((*shape, 3), dtype), SO3.identity(shape, dtype))

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return SE3(self.xyz + self.rot.act(other.xyz), self.rot @ other.rot)
        return self.act(other)

    def act(self, p: Array) -> Array:
        return self.rot.act(p) + self.xyz

    def inverse(self) -> "SE3":
        rinv = self.rot.inverse()
        return SE3(-rinv.act(self.xyz), rinv)

    def log(self) -> Array:
        """Tangent ``[..., 6] = (v, omega)`` (translation first, Sophus order)."""
        w = self.rot.log()
        angle = jnp.linalg.norm(w, axis=-1, keepdims=True)
        small = (angle < 1e-6)[..., 0]
        angle_safe = jnp.where(small[..., None], 1.0, angle)
        axis = w / angle_safe
        # V^{-1} t using the closed form
        half = 0.5 * angle
        cot_half = jnp.where(
            small[..., None], 2.0 / angle_safe, jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-30)
        )
        k = jnp.where(small[..., None], angle * angle / 12.0, 1.0 - 0.5 * angle * cot_half)
        t = self.xyz
        wxt = jnp.cross(w, t)
        wxwxt = jnp.cross(w, wxt)
        a2 = jnp.where(small[..., None], 1.0, angle_safe * angle_safe)
        v = t - 0.5 * wxt + jnp.where(small[..., None], 1.0 / 12.0, k / a2) * wxwxt
        del axis
        return jnp.concatenate([v, w], axis=-1)

    @staticmethod
    def exp(tangent: Array) -> "SE3":
        v, w = tangent[..., :3], tangent[..., 3:]
        rot = SO3.exp(w)
        angle = jnp.linalg.norm(w, axis=-1, keepdims=True)
        small = angle < 1e-6
        a = jnp.where(small, 1.0, angle)
        A = jnp.where(small, 1.0 - angle * angle / 6.0, jnp.sin(a) / a)
        B = jnp.where(small, 0.5 - angle * angle / 24.0, (1.0 - jnp.cos(a)) / (a * a))
        C = jnp.where(small, 1.0 / 6.0 - angle * angle / 120.0, (1.0 - A) / (a * a))
        wxv = jnp.cross(w, v)
        wxwxv = jnp.cross(w, wxv)
        t = v + B * wxv + C * wxwxv
        del A
        return SE3(t, rot)

    @property
    def shape(self):
        return self.xyz.shape[:-1]


# ---------------------------------------------------------------------------
# 2D <-> 3D planar embedding (reference: beluga/3d_embedding.hpp:23-36)
# ---------------------------------------------------------------------------


def to_3d(pose: SE2) -> SE3:
    """Embed an SE2 pose into SE3 on the z=0 plane."""
    zeros = jnp.zeros_like(pose.x)
    xyz = jnp.stack([pose.x, pose.y, zeros], axis=-1)
    half = 0.5 * pose.theta
    q = jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)
    return SE3(xyz, SO3(q))


def to_2d(pose: SE3) -> SE2:
    """Project an SE3 pose to the z=0 plane keeping yaw."""
    _, _, yaw = pose.rot.rpy()
    return SE2(pose.xyz[..., :2], SO2.exp(yaw))
