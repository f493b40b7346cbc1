"""Pallas fused code-table lookup kernel.

The XLA formulation of the one-hot MXU lookup (ops/gather2d.py,
``_codebook_lookup``) materializes the one-hot selector ``bf16[C, H]`` and
the selected rows ``f32[C, W]`` in HBM on every scan step — for the bench
reweight that is ~70 GB of HBM traffic per update, which caps the lookup at
~58% of the MXU.  This kernel performs the whole chain

    one-hot(y) -> MXU row-select -> x-select -> 256-entry codebook decode

inside VMEM: the code table stays resident (384x384 bf16 = 294 KB), the
selector and row buffers never leave the chip, and the only HBM traffic is
the query indices in and the decoded values out (~12 B/query).  Codes are
stored as int8 (offset by -128): the int8 MXU path is 2x bf16 on v5e and
integer accumulation keeps the select exact.

Layout: queries ride the *lane* axis (blocks ``[1, C]``), so the one-hot is
``[H, C]`` and the row-select is ``codes^T [W, H] @ oh [H, C]`` — everything
is naturally tiled and nothing pads (a ``[Q, 1]`` layout would expand 128x).

Numerics are identical to ``_codebook_lookup``: integer codes < 256 are
exact in bf16, the f32 accumulation of a one-hot selection is exact, and
the decode reads codebook entries verbatim — so the kernel is bit-exact
w.r.t. ``codebook[codes[y, x]]``.

Reference behavior being accelerated: the likelihood-field beam lookup of
sensor/likelihood_field_model.hpp:76-89.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BLOCK = 4096  # queries per program (lane axis); best of the measured sweep


def _kernel(yi_ref, xi_ref, codes_t_ref, book_ref, out_ref):
    rows_per_blk, c = yi_ref.shape
    w, h = codes_t_ref.shape
    n_book = book_ref.shape[0]
    int8_path = codes_t_ref.dtype == jnp.int8  # codes stored offset by -128

    iota_h = jax.lax.broadcasted_iota(jnp.int32, (h, c), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, c), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_book, c), 0)

    for r in range(rows_per_blk):  # static unroll over the 8 sublane rows
        oh_y = (yi_ref[r, :][None, :] == iota_h).astype(codes_t_ref.dtype)  # [H, C]
        if int8_path:
            # int8 x int8 -> int32: 2x the bf16 MXU rate on v5e, and the
            # accumulation is integer-exact by construction
            rows = jax.lax.dot(
                codes_t_ref[:], oh_y, preferred_element_type=jnp.int32
            )  # [W, C]
            code = jnp.sum(
                jnp.where(xi_ref[r, :][None, :] == iota_w, rows, 0),
                axis=0,
                keepdims=True,
            ) + 128  # undo the -128 storage offset
        else:
            rows = jnp.dot(
                codes_t_ref[:], oh_y, preferred_element_type=jnp.float32
            )  # [W, C]
            code = jnp.sum(
                jnp.where(xi_ref[r, :][None, :] == iota_w, rows, 0.0),
                axis=0,
                keepdims=True,
            ).astype(jnp.int32)  # [1, C]
        out_ref[r, :] = jnp.sum(
            jnp.where(code == iota_c, book_ref[:], 0.0), axis=0
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_codebook_lookup(
    codes: Array, codebook: Array, yi: Array, xi: Array, interpret: bool = False
) -> Array:
    """Fused ``codebook[codes[clip(yi), clip(xi)]]`` for arbitrary-shape queries.

    ``codes``: i32/f32[H, W] code table (values < len(codebook));
    ``codebook``: f32[K].  Returns f32 with the shape of ``yi``.
    """
    h, w = codes.shape
    k = codebook.shape[0]
    shape = yi.shape
    yif = jnp.clip(yi, 0, h - 1).ravel()
    xif = jnp.clip(xi, 0, w - 1).ravel()
    n = yif.shape[0]
    blk = 8 * _BLOCK  # (8 sublane rows) x (_BLOCK lanes) queries per program
    pad = -(-n // blk) * blk - n
    g = (n + pad) // blk
    yif = jnp.pad(yif, (0, pad)).reshape(8 * g, _BLOCK)
    xif = jnp.pad(xif, (0, pad)).reshape(8 * g, _BLOCK)

    # int8 one-hot select (codes offset to [-128, 127]) is integer-exact and
    # runs at 2x the bf16 MXU rate on v5e (9.5e8 vs 5.0e8 lookups/s measured);
    # interpret mode (CPU tests) lacks int8/bf16 dot support -> f32.
    if interpret:
        codes_t = codes.T.astype(jnp.float32)  # [W, H]
    else:
        codes_t = (codes.T.astype(jnp.int32) - 128).astype(jnp.int8)
    book2d = codebook[:, None].astype(jnp.float32)  # [K, 1]

    out = pl.pallas_call(
        _kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((8, _BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * g, _BLOCK), jnp.float32),
        interpret=interpret,
    )(yif, xif, codes_t, book2d)
    return out.ravel()[:n].reshape(shape)


# ---------------------------------------------------------------------------
# pooled row take: out[i] = pool[idx[i]] without serialized gathers
# ---------------------------------------------------------------------------

_POOL_BLOCK = 512  # queries per sublane row (8 rows per program)


def _pool_kernel(idx_ref, pool_ref, out_ref):
    rows, b = idx_ref.shape
    c3, p = pool_ref.shape
    c = c3 // 3
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (p, b), 0).astype(jnp.float32)
    for r in range(rows):  # static unroll over the 8 sublane rows
        oh = (idx_ref[r, :][None, :] == iota_p).astype(pool_ref.dtype)  # [P, B]
        # 3-plane bf16 rows x one-hot: each product is exact (bf16 value x 1
        # in f32 accumulation) and the truncation-split planes sum back to
        # the f32 value bit-for-bit — a plain f32 dot would bf16-quantize
        # the pool on the MXU (jax.lax.dot DEFAULT precision truncates f32
        # operands to one bf16 pass; preferred_element_type only sets the
        # accumulator)
        sel = jax.lax.dot(
            pool_ref[:], oh, preferred_element_type=jnp.float32
        )  # [3C, B]
        out_ref[r, :, :] = sel[:c] + sel[c : 2 * c] + sel[2 * c :]


def pallas_pool_take(pool: Array, idx: Array, interpret: bool = False) -> Array:
    """``pool[idx]`` for a small pool, on the MXU: ``f32[N, C]``.

    Per-row random gathers serialize at ~5e7 rows/s on TPU regardless of
    table size (docs/kernels.md); for a pool of ``P <= ~1024`` rows the
    one-hot select-matmul fetches rows at VPU-compare speed instead
    (~P compares + C MACs per query, all in VMEM).  Used by the pooled
    recovery-state generator (core/random.py).

    ``pool``: f32[P, C] (C <= 8 columns); ``idx``: integer-valued [N]
    (any real dtype).  Exact: the pool rides the MXU as hi/mid/lo bf16
    truncation-split planes (pallas_resample._split3), so the copy is
    bit-exact f32 — the pool is tiny, the 3x matmul cost is negligible.
    """
    from beluga_tpu.ops.pallas_resample import _split3

    p, c = pool.shape
    n = idx.shape[0]
    blk = 8 * _POOL_BLOCK
    pad = -(-n // blk) * blk - n
    g = (n + pad) // blk
    idx_f = jnp.pad(idx.astype(jnp.float32), (0, pad), constant_values=-1.0)
    idx_f = idx_f.reshape(8 * g, _POOL_BLOCK)
    pool_t = _split3(pool.T.astype(jnp.float32))  # bf16 [3C, P]

    out = pl.pallas_call(
        _pool_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((8, _POOL_BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, c, _POOL_BLOCK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8 * g, c, _POOL_BLOCK), jnp.float32),
        interpret=interpret,
    )(idx_f, pool_t)
    return out.transpose(0, 2, 1).reshape(8 * g * _POOL_BLOCK, c)[:n]
