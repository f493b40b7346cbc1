"""Fast 2D table lookup — the hot primitive of the likelihood-field model.

Measured on TPU v5e (synchronous mode, see NOTES.md):
  * XLA random gather: ~1.0e8 lookups/s (serialized scalar path);
  * hardware ``tpu.dynamic_gather`` is vreg-local (source must fit one
    vreg along the gather axis), so a table-sized Pallas gather kernel is
    not expressible on this generation;
  * the MXU *can* do lookups: a one-hot row-selector matmul costs
    ``table_size`` MACs per query → bound ≈ 2e14 / 1.5e5 ≈ 1.4e9 lookups/s
    for a 384² map — an order of magnitude above the gather path.

Modes:
  * ``gather``  — exact, XLA gather (reference implementation, CPU default);
  * ``onehot``  — exact (f32 accumulation of a 0/1 selector), MXU-bound;
  * ``lowrank`` — approximate: the table is factored as ``U @ V^T`` (SVD,
    rank r), lookup = (onehot_y @ U) · (onehot_x @ V) at ``2·H·r`` MACs per
    query — another ~6× over onehot at r=32, with truncation error bounded
    by the discarded singular values (smooth likelihood fields compress
    well). Opt-in; never used for parity tests.
  * ``auto``    — gather on CPU / small batches, onehot on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_CHUNK = 4096  # queries per one-hot matmul block


def _plain_lookup(table: Array, yi: Array, xi: Array) -> Array:
    h, w = table.shape
    return table[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]


def _onehot_lookup(table: Array, yi: Array, xi: Array) -> Array:
    """Exact lookup via MXU: rows = onehot_y @ table; out = rows · onehot_x.

    The one-hot entries are exactly representable in bf16, and the f32
    ``preferred_element_type`` accumulation selects single table entries
    without rounding them (a 1.0·x product is exact in bf16×bf16→f32 only
    if x fits bf16 — so the row-select pass keeps the table in f32 and
    relies on DEFAULT precision splitting; exactness is verified by tests).
    """
    h, w = table.shape
    shape = yi.shape
    yif = jnp.clip(yi, 0, h - 1).ravel()
    xif = jnp.clip(xi, 0, w - 1).ravel()
    n = yif.shape[0]
    pad = -(-n // _CHUNK) * _CHUNK - n
    yif = jnp.pad(yif, (0, pad))
    xif = jnp.pad(xif, (0, pad))

    iota_h = jnp.arange(h, dtype=jnp.int32)
    iota_w = jnp.arange(w, dtype=jnp.int32)

    def body(c, _):
        y = jax.lax.dynamic_slice(yif, (c * _CHUNK,), (_CHUNK,))
        x = jax.lax.dynamic_slice(xif, (c * _CHUNK,), (_CHUNK,))
        oh_y = (y[:, None] == iota_h[None, :]).astype(table.dtype)
        # HIGH (3-pass bf16) is the measured sweet spot: 2.35e8 lookups/s at
        # <=1e-5 abs error on TPU; on CPU all precisions are exact f32.
        rows = jax.lax.dot(
            oh_y, table, precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )
        sel = jnp.sum(
            jnp.where(x[:, None] == iota_w[None, :], rows, 0.0), axis=1
        )
        return c + 1, sel

    _, out = jax.lax.scan(body, 0, None, length=(n + pad) // _CHUNK)
    return out.ravel()[:n].reshape(shape)


def build_device_codebook(table: Array, fallback_book: Array) -> Array:
    """Codebook of the table's distinct values, computed on device.

    Sort + unique-scatter with a fixed 256-slot capacity: bit-exact when the
    table has <= 256 distinct values (likelihood fields do — see
    maps/codebook.py), otherwise falls back to the host-proposed analytic
    codebook, selected on device so no readback ever happens.  One-off
    map-load work inside a single jit.
    """
    cap = fallback_book.shape[0]

    @jax.jit
    def build(table, fallback):
        v = jnp.sort(table.ravel())
        lead = jnp.concatenate([jnp.ones((1,), bool), v[1:] != v[:-1]])
        n_distinct = jnp.sum(lead.astype(jnp.int32))
        rank = jnp.cumsum(lead.astype(jnp.int32)) - 1
        pos = jnp.where(lead & (rank < cap), rank, cap)  # cap -> dropped
        book = jnp.full((cap,), v[-1], v.dtype).at[pos].set(v, mode="drop")
        return jnp.where(n_distinct <= cap, book, fallback)

    return build(table, fallback_book)


def encode_table(table: Array, codebook: Array) -> Array:
    """Nearest-codebook codes for every table entry: ``i32[H, W]``.

    Jitted map-load-time work; no host readback (NOTES.md: a device_get
    permanently switches remote sessions to synchronous mode).
    """

    @jax.jit
    def enc(table, book):
        def row(t_row):
            d = jnp.abs(t_row[:, None] - book[None, :])
            return jnp.argmin(d, axis=-1).astype(jnp.int32)

        return jax.lax.map(row, table)

    return enc(table, codebook)


def _codebook_lookup(codes: Array, codebook: Array, yi: Array, xi: Array) -> Array:
    """Exact-to-codebook lookup: one bf16 one-hot pass over integer codes.

    Codes are small integers (< 256) — exactly representable in bf16 — so a
    *single* bf16 one-hot matmul selects them without rounding (the 3-pass
    HIGH trick is only needed for full-precision f32 tables).  The selected
    code is then decoded through the 256-entry codebook with a cheap VPU
    one-hot.  Runs at the bf16 MXU rate: ~2x the 3-pass default, with
    reconstruction error equal to the codebook quantization error (zero when
    the table has <= 256 distinct values — true for production likelihood
    fields, see maps/codebook.py).
    """
    h, w = codes.shape
    shape = yi.shape
    yif = jnp.clip(yi, 0, h - 1).ravel()
    xif = jnp.clip(xi, 0, w - 1).ravel()
    n = yif.shape[0]
    pad = -(-n // _CHUNK) * _CHUNK - n
    yif = jnp.pad(yif, (0, pad))
    xif = jnp.pad(xif, (0, pad))

    iota_h = jnp.arange(h, dtype=jnp.int32)
    iota_w = jnp.arange(w, dtype=jnp.int32)
    iota_c = jnp.arange(codebook.shape[0], dtype=jnp.int32)
    codes_bf = codes.astype(jnp.bfloat16)

    def body(c, _):
        y = jax.lax.dynamic_slice(yif, (c * _CHUNK,), (_CHUNK,))
        x = jax.lax.dynamic_slice(xif, (c * _CHUNK,), (_CHUNK,))
        oh_y = (y[:, None] == iota_h[None, :]).astype(jnp.bfloat16)
        rows = jax.lax.dot(oh_y, codes_bf, preferred_element_type=jnp.float32)
        code = jnp.sum(
            jnp.where(x[:, None] == iota_w[None, :], rows, 0.0), axis=1
        ).astype(jnp.int32)
        val = jnp.sum(
            jnp.where(code[:, None] == iota_c[None, :], codebook[None, :], 0.0),
            axis=1,
        )
        return c + 1, val

    _, out = jax.lax.scan(body, 0, None, length=(n + pad) // _CHUNK)
    return out.ravel()[:n].reshape(shape)


def factorize_table(table: Array, rank: int):
    """SVD factorization for the ``lowrank`` mode: returns (U·s, V).

    Runs on host (numpy): map-load-time work, and TPU SVD support is
    unreliable.
    """
    import numpy as np

    t = np.asarray(jax.device_get(table), np.float64)
    u, s, vt = np.linalg.svd(t, full_matrices=False)
    return (
        jnp.asarray((u[:, :rank] * s[None, :rank]).astype(np.float32)),
        jnp.asarray(vt[:rank].T.astype(np.float32)),
    )


def _lowrank_lookup(u: Array, v: Array, yi: Array, xi: Array) -> Array:
    """Approximate lookup from a factored table: out = U[y] · V[x]."""
    h, r = u.shape
    w = v.shape[0]
    shape = yi.shape
    yif = jnp.clip(yi, 0, h - 1).ravel()
    xif = jnp.clip(xi, 0, w - 1).ravel()
    n = yif.shape[0]
    pad = -(-n // _CHUNK) * _CHUNK - n
    yif = jnp.pad(yif, (0, pad))
    xif = jnp.pad(xif, (0, pad))
    iota_h = jnp.arange(h, dtype=jnp.int32)
    iota_w = jnp.arange(w, dtype=jnp.int32)
    ub = u.astype(jnp.bfloat16)
    vb = v.astype(jnp.bfloat16)

    def body(c, _):
        y = jax.lax.dynamic_slice(yif, (c * _CHUNK,), (_CHUNK,))
        x = jax.lax.dynamic_slice(xif, (c * _CHUNK,), (_CHUNK,))
        oh_y = (y[:, None] == iota_h[None, :]).astype(jnp.bfloat16)
        oh_x = (x[:, None] == iota_w[None, :]).astype(jnp.bfloat16)
        uy = jax.lax.dot(oh_y, ub, preferred_element_type=jnp.float32)
        vx = jax.lax.dot(oh_x, vb, preferred_element_type=jnp.float32)
        return c + 1, jnp.sum(uy * vx, axis=-1)

    _, out = jax.lax.scan(body, 0, None, length=(n + pad) // _CHUNK)
    return out.ravel()[:n].reshape(shape)


def table_lookup(table: Array, yi: Array, xi: Array, mode: str = "auto") -> Array:
    """Clipped 2D lookup ``table[yi, xi]``.

    mode: 'gather' | 'onehot' | 'auto'. ('lowrank' is used through
    :func:`factorize_table` + :func:`_lowrank_lookup` by callers that hold
    the factors.)
    """
    if mode == "gather":
        return _plain_lookup(table, yi, xi)
    if mode == "onehot":
        return _onehot_lookup(table, yi, xi)
    if mode != "auto":
        raise ValueError(f"unknown lookup mode {mode!r}")
    # the one-hot cost scales with the table size (H·W MACs per query), so
    # it only beats the ~1e8/s serialized gather for small tables and large
    # query batches
    h, w = table.shape
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and yi.size >= 65536 and h * w <= 512 * 512:
        return _onehot_lookup(table, yi, xi)
    return _plain_lookup(table, yi, xi)
