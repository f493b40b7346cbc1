"""Introspection / visualization data products.

Middleware-free equivalents of the beluga_ros visualization helpers — the
functions return plain arrays that any frontend (matplotlib, rviz bridge,
web) can render:

  * :func:`likelihood_field_as_occupancy` — normalizes a likelihood field
    to 0..100 int8 occupancy values (beluga_ros/likelihood_field.hpp:26-58);
  * :func:`particle_markers` — weight-scaled arrow markers grouped by pose
    bucket (particle_cloud.hpp:100-314's MarkerArray, as arrays);
  * :func:`resampled_pose_array` — fixed-size pose array drawn by weight
    (the PoseArray publisher resamples to a target size).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.models.sensor.likelihood_field import LikelihoodField
from beluga_tpu.ops.resample import multinomial_indices

Array = jax.Array


def likelihood_field_as_occupancy(field: LikelihoodField) -> np.ndarray:
    """``int8[H, W]`` 0..100 normalized view of the likelihood field."""
    vals = np.asarray(jax.device_get(field.values), np.float64)
    vmax = vals.max() if vals.size else 1.0
    return np.clip(vals / max(vmax, 1e-12) * 100.0, 0, 100).astype(np.int8)


def particle_markers(xyt: np.ndarray, weights: np.ndarray, resolution=0.1):
    """Bucketize particles by pose and return one arrow marker per bucket.

    Returns ``(poses [k, 3], scales [k])``: scale is the bucket's total
    normalized weight (arrow length / disc radius driver in the reference).
    """
    xyt = np.asarray(xyt, np.float64)
    w = np.asarray(weights, np.float64)
    w = w / max(w.sum(), 1e-12)
    keys = np.round(xyt / resolution).astype(np.int64)
    _, inverse, counts = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
    k = counts.shape[0]
    poses = np.zeros((k, 3))
    scales = np.zeros(k)
    np.add.at(scales, inverse, w)
    for d in range(3):
        sums = np.zeros(k)
        np.add.at(sums, inverse, xyt[:, d] * w)
        poses[:, d] = sums / np.maximum(scales, 1e-12)
    return poses, scales


def resampled_pose_array(key, xyt: Array, weights: Array, size: int) -> Array:
    """Draw ``size`` poses with replacement by weight (PoseArray publisher)."""
    idx = multinomial_indices(key, weights, size)
    return jnp.take(xyt, idx, axis=0)


def ndt_ellipsoids(ndt_map):
    """NDT cells as ellipsoid marker data (beluga_ros/src/ndt_ellipsoid.cpp).

    Returns ``(centers [C, D], radii [C, D], rotations [C, D, D], valid
    [C])``: per cell, the eigendecomposition of the covariance gives the
    principal half-axes (sqrt of eigenvalues) and orientation; cells whose
    covariance fails to decompose cleanly are flagged invalid (the
    reference renders those as cubes).
    """
    means = np.asarray(jax.device_get(ndt_map.means), np.float64)
    covs = np.asarray(jax.device_get(ndt_map.covs), np.float64)
    n = int(jax.device_get(ndt_map.num_cells))
    means, covs = means[:n], covs[:n]
    d = means.shape[1]
    radii = np.zeros((n, d))
    rots = np.zeros((n, d, d))
    valid = np.zeros(n, bool)
    for i in range(n):
        try:
            w, v = np.linalg.eigh(covs[i])
            if np.all(w > 0):
                if np.linalg.det(v) < 0:  # keep right-handed rotations
                    v[:, 0] = -v[:, 0]
                radii[i] = np.sqrt(w)
                rots[i] = v
                valid[i] = True
        except np.linalg.LinAlgError:
            pass
    return means, radii, rots, valid
