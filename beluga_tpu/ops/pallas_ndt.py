"""Pallas fused NDT cell probe.

The XLA formulation (maps/ndt.py::_lookup_gaussians_onehot) materializes
the [chunk, M] key-match matrix in HBM every scan step; this kernel keeps
the sorted key table and the packed mean/covariance planes resident in
VMEM, so the probe is one compare pass + one bf16 matmul per query block
with ~(8 + 4*(D + D^2)) bytes of HBM traffic per query.

Same numerics as the XLA path: exact key match; values reconstructed from
bf16 hi/lo planes (~2^-16 relative — far inside the NDT likelihood
tolerances).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BLOCK = 2048  # queries per row (lane axis); 8 rows per program


def _make_kernel(num_planes: int, int8_like: bool):
    def kernel(q_ref, keys_ref, planes_ref, vals_ref, found_ref):
        rows, c = q_ref.shape
        m = keys_ref.shape[1]
        keys_col = keys_ref[0, :][:, None]  # [M, 1]

        for r in range(rows):
            q = q_ref[r, :][None, :]  # [1, C]
            match = keys_col == q  # [M, C]
            found_ref[r, :] = jnp.any(match, axis=0).astype(jnp.float32)
            dtype = planes_ref.dtype
            vals_ref[r, :, :] = jax.lax.dot(
                planes_ref[:], match.astype(dtype),
                preferred_element_type=jnp.float32,
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def ndt_probe(
    keys: Array, planes: Array, queries: Array, interpret: bool = False
) -> tuple[Array, Array]:
    """Match ``queries`` (u32[...]) against ``keys`` (u32[M], padding =
    0xFFFFFFFF) and fetch ``planes`` (f32-convertible [P, M]) for matches.

    Returns ``(values f32[..., P], found bool[...])``; unmatched queries
    get zero values.
    """
    p, m = planes.shape
    shape = queries.shape
    qf = queries.ravel()
    n = qf.shape[0]
    blk = 8 * _BLOCK
    pad = -(-n // blk) * blk - n
    g = (n + pad) // blk
    # padded queries use a value that never matches a live or padded key
    qf = jnp.pad(qf, (0, pad), constant_values=jnp.uint32(0xFFFFFFFE))
    qf = qf.reshape(8 * g, _BLOCK)

    m_pad = -(-m // 128) * 128
    keys_p = jnp.pad(keys, (0, m_pad - m), constant_values=jnp.uint32(0xFFFFFFFF))
    p_pad = -(-p // 8) * 8
    planes_p = jnp.pad(planes, ((0, p_pad - p), (0, m_pad - m))).astype(
        jnp.float32 if interpret else jnp.bfloat16
    )

    vals, found = pl.pallas_call(
        _make_kernel(p_pad, not interpret),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((8, _BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, p_pad, _BLOCK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8 * g, p_pad, _BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((8 * g, _BLOCK), jnp.float32),
        ),
        interpret=interpret,
    )(qf, keys_p[None, :], planes_p)
    vals = jnp.transpose(vals, (0, 2, 1)).reshape(-1, p_pad)[:n, :p]
    found = found.reshape(-1)[:n] > 0.0
    return vals.reshape(shape + (p,)), found.reshape(shape)
