"""State-sampling distributions (initialization & recovery injection).

TPU analogs of the reference's distribution objects:
  * ``MultivariateNormalDistribution`` over SE2 / SE3
    (random/multivariate_normal_distribution.hpp:138) — used for pose
    initialization with covariance and for NDT-node recovery states.
  * ``MultivariateUniformDistribution`` over an axis-aligned box and over the
    free cells of an occupancy grid
    (random/multivariate_uniform_distribution.hpp:44,81,127) — the latter is
    the AMCL global-localization / recovery-particle source.

Each sampler is a pure function ``(key, n) -> states`` so it can be called
inside jit and vmapped over filter batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beluga_tpu.lie import SE2, SE3, SO2, SO3

Array = jax.Array


def _sqrt_psd(cov: Array) -> Array:
    """Symmetric PSD square root via eigendecomposition.

    The reference validates symmetry / positive semi-definiteness and builds
    the sampling transform the same way
    (multivariate_normal_distribution.hpp:76-90); here negative eigenvalues
    are clamped to zero instead of throwing (jit-compatible).
    """
    w, v = jnp.linalg.eigh(cov)
    w = jnp.maximum(w, 0.0)
    return v * jnp.sqrt(w)[..., None, :]


def sample_normal_se2(key: Array, n: int, mean: SE2, cov: Array) -> SE2:
    """Draw n SE2 poses ~ N(mean, cov) with cov 3x3 over (x, y, theta).

    Perturbations are additive in (x, y) and in yaw, matching the reference's
    vector-space sampling for SE2 (it samples (x, y, theta) jointly and
    reassembles the pose, multivariate_distribution_traits.hpp).
    """
    t = _sqrt_psd(cov.astype(jnp.float32))
    z = jax.random.normal(key, (n, 3), jnp.float32)
    delta = z @ t.T
    xy = mean.xy + delta[..., :2]
    theta = mean.theta + delta[..., 2]
    return SE2(xy, SO2.exp(theta))


def sample_normal_se3(key: Array, n: int, mean: SE3, cov: Array) -> SE3:
    """Draw n SE3 poses with 6x6 cov over (x, y, z, roll, pitch, yaw)."""
    t = _sqrt_psd(cov.astype(jnp.float32))
    z = jax.random.normal(key, (n, 6), jnp.float32)
    delta = z @ t.T
    xyz = mean.xyz + delta[..., :3]
    rot = mean.rot @ SO3.exp(delta[..., 3:])
    return SE3(xyz, rot)


def sample_uniform_box_se2(key: Array, n: int, lo: Array, hi: Array) -> SE2:
    """Uniform SE2 inside an AABB with uniform heading
    (multivariate_uniform_distribution.hpp:44-79)."""
    k_xy, k_th = jax.random.split(key)
    xy = jax.random.uniform(k_xy, (n, 2), jnp.float32, jnp.asarray(lo), jnp.asarray(hi))
    return SE2(xy, SO2.sample_uniform(k_th, (n,)))


def sample_uniform_box_se3(key: Array, n: int, lo, hi) -> SE3:
    """Uniform SE3 inside an AABB with uniform random orientation
    (multivariate_uniform_distribution.hpp:81-120)."""
    k_xyz, k_rot = jax.random.split(key)
    xyz = jax.random.uniform(
        k_xyz, (n, 3), jnp.float32, jnp.asarray(lo), jnp.asarray(hi)
    )
    return SE3(xyz, SO3.sample_uniform(k_rot, (n,)))


def sample_uniform_free_cells(key: Array, n: int, free_xy: Array, num_free: Array) -> SE2:
    """Uniform SE2 over the free cells of an occupancy grid.

    ``free_xy`` is a padded ``f32[C, 2]`` array of free-cell centroid world
    coordinates and ``num_free`` the number of valid entries (grids have a
    static cell count, so C is the total cell count and only the prefix is
    valid).  Mirrors multivariate_uniform_distribution.hpp:127-150: the
    translation snaps to a free-cell centroid, the heading is uniform.
    """
    k_idx, k_th = jax.random.split(key)
    idx = jax.random.randint(k_idx, (n,), 0, jnp.maximum(num_free, 1))
    xy = jnp.take(free_xy, idx, axis=0)
    return SE2(xy, SO2.sample_uniform(k_th, (n,)))


def sample_uniform_free_cells_pooled(
    key: Array,
    n: int,
    free_xy: Array,
    num_free: Array,
    pool: int = 256,
    interpret: bool | None = None,
) -> SE2:
    """Free-cell-uniform SE2 states through a fresh per-call candidate pool.

    The exact sampler gathers ``n`` random rows of ``free_xy`` — serialized
    at ~5e7 rows/s on TPU, which makes recovery-state generation a fixed
    multi-ms tax on every resample even when no particle is injected
    (p_random = 0 while tracking).  This variant gathers only ``pool``
    fresh iid candidate cells per call and assigns every output slot an
    independent uniform choice *among the pool* on the MXU
    (ops/pallas_lookup.py pallas_pool_take) — no [n]-sized gather anywhere.

    Statistics: the marginal of every output is exactly uniform over free
    cells (pool entries are iid uniform; slot choices are uniform among
    them).  Deviation from the reference's iid stream is joint-only: two
    outputs of the same call may collide on a pool entry (bootstrap
    resampling; expected distinct cells among k injected slots is
    pool·(1−(1−1/pool)^k) ≈ k − k²/2·pool for k ≪ pool, saturating at
    ``pool`` for k ≫ pool — callers that may inject k ≫ pool should scale
    the pool with the request size, as make_grid_random_state_fn does).
    Heading stays iid uniform per slot.
    """
    from beluga_tpu.ops.pallas_lookup import pallas_pool_take

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_pool, k_idx, k_th = jax.random.split(key, 3)
    cand = jax.random.randint(k_pool, (pool,), 0, jnp.maximum(num_free, 1))
    pool_xy = jnp.take(free_xy, cand, axis=0)  # [pool, 2] — the only gather
    idx = jax.random.randint(k_idx, (n,), 0, pool)
    xy = pallas_pool_take(pool_xy, idx, interpret=interpret)
    return SE2(xy, SO2.sample_uniform(k_th, (n,)))
