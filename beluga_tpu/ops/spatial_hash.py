"""Vectorized spatial hashing for KLD bucketing and clustering.

The reference hashes a state by flooring each coordinate at a resolution,
Fibonacci-hashing each integer, bit-rotating per axis and XOR-folding
(``algorithm/spatial_hash.hpp:44-273``).  We reproduce the same construction
in 32-bit (JAX default int width; 64-bit would require x64 mode, which TPUs
emulate slowly).  Hash values never cross the API boundary — they are only
compared for equality to count distinct buckets — so 32-bit collision rates
(~N^2 / 2^32) are negligible at feasible particle counts.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

# 2^32 / golden ratio; kept as a python int so it traces as an inline
# literal, never as a hoisted jaxpr constant (see utils/jax_compat.py)
_FIB32 = 2654435769


def _floor_fibo_hash(value: Array, bits: int, index: int) -> Array:
    """floor → fibonacci spread → rotate left by ``bits * index`` (32-bit)."""
    v = jnp.floor(value).astype(jnp.int32).astype(jnp.uint32)
    h = v * jnp.uint32(_FIB32)
    shift = (bits * index) % 32
    if shift == 0:
        return h
    return (h << jnp.uint32(shift)) | (h >> jnp.uint32(32 - shift))


def hash_components(components: Sequence[Array], resolutions: Sequence[float]) -> Array:
    """XOR-fold the per-axis hashes of ``components[i] / resolutions[i]``.

    Mirrors ``detail::hash_impl`` (spatial_hash.hpp:87-94) with
    kBits = 32 / n_components.
    """
    n = len(components)
    bits = 32 // n
    out = None
    for i, (c, r) in enumerate(zip(components, resolutions)):
        h = _floor_fibo_hash(jnp.asarray(c) / r, bits, i)
        out = h if out is None else out ^ h
    return out


def spatial_hash_se2(xy: Array, theta: Array, res_xy: float, res_theta: float,
                     res_y: float | None = None) -> Array:
    """Hash SE2 states on (x, y, theta) (spatial_hash.hpp:160-197)."""
    if res_y is None:
        res_y = res_xy
    return hash_components(
        [xy[..., 0], xy[..., 1], theta], [res_xy, res_y, res_theta]
    )


def spatial_hash_se3(xyz: Array, rpy: tuple[Array, Array, Array],
                     res_lin: float, res_ang: float) -> Array:
    """Hash SE3 states on (x, y, z, roll, pitch, yaw) (spatial_hash.hpp:204-274)."""
    roll, pitch, yaw = rpy
    return hash_components(
        [xyz[..., 0], xyz[..., 1], xyz[..., 2], roll, pitch, yaw],
        [res_lin, res_lin, res_lin, res_ang, res_ang, res_ang],
    )
