"""Sparse NDT voxel maps as padded dense tables with sorted-key lookup.

The reference stores NDT maps in ``SparseValueGrid`` — an
``unordered_map<Vector2i/3i, NDTCell>`` (sensor/data/sparse_value_grid.hpp).
On TPU the map becomes three dense arrays (cell coords, means, covariances)
plus a *sorted encoded key* table, so that "hash-map lookup" is a
``searchsorted`` + gather over all queries at once.

Cell coordinates are packed into a single uint32 key:
  * 2D: 16 bits per axis, biased — supports cell indices in [-32768, 32767];
  * 3D: 10 bits per axis, biased — supports cell indices in [-512, 511]
    (at typical NDT resolutions of 0.5-1 m that is a ±256-512 m map span).

Includes the HDF5 loader matching the reference's dataset layout
(``sensor/ndt_sensor_model.hpp:246-320``: "resolution", "cells", "means",
"covariances").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_BIAS2, _BITS2 = 1 << 15, 16
_BIAS3, _BITS3 = 1 << 9, 10


def _dc(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


def encode_cells(cells: Array) -> Array:
    """Pack integer cell coords ``i32[..., D]`` into ``u32[...]`` keys."""
    d = cells.shape[-1]
    if d == 2:
        x = (cells[..., 0] + _BIAS2).astype(jnp.uint32)
        y = (cells[..., 1] + _BIAS2).astype(jnp.uint32)
        return (x << _BITS2) | (y & jnp.uint32((1 << _BITS2) - 1))
    if d == 3:
        x = (cells[..., 0] + _BIAS3).astype(jnp.uint32)
        y = (cells[..., 1] + _BIAS3).astype(jnp.uint32)
        z = (cells[..., 2] + _BIAS3).astype(jnp.uint32)
        m = jnp.uint32((1 << _BITS3) - 1)
        return ((x & m) << (2 * _BITS3)) | ((y & m) << _BITS3) | (z & m)
    raise ValueError(f"unsupported dimension {d}")


@_dc
class NdtMap:
    """Padded sorted NDT cell table.

    Attributes:
      keys: ``u32[C]`` sorted encoded cell coords (padding = 0xFFFFFFFF).
      means: ``f32[C, D]`` Gaussian means (world units).
      covs: ``f32[C, D, D]`` Gaussian covariances.
      num_cells: scalar i32.
      resolution: scalar f32.
    """

    keys: Array
    means: Array
    covs: Array
    num_cells: Array
    resolution: Array

    @property
    def dim(self) -> int:
        return self.means.shape[-1]

    def lookup(self, cells: Array) -> tuple[Array, Array]:
        """Map cell coords ``i32[..., D]`` → (index ``i32[...]``, found bool).

        Unfound queries return index 0 with found=False.
        """
        q = encode_cells(cells)
        idx = jnp.searchsorted(self.keys, q)
        idx = jnp.clip(idx, 0, self.keys.shape[0] - 1)
        found = (self.keys[idx] == q) & (idx < self.num_cells)
        return jnp.where(found, idx, 0), found

    def cell_near(self, points: Array) -> Array:
        """floor(p / resolution) (regular_grid.hpp:76-80)."""
        return jnp.floor(points / self.resolution).astype(jnp.int32)

    def lookup_gaussians(self, cells: Array) -> tuple[Array, Array, Array]:
        """Cell coords ``i32[..., D]`` → (means ``[..., D]``, covs
        ``[..., D, D]``, found ``bool[...]``).

        On TPU the probe is a one-hot key match + MXU value fetch — binary
        search and row gathers serialize at ~5e7/s on v5e, which made the
        NDT reweight the slowest sensor path; the one-hot formulation is
        ~20x faster at typical map sizes.  CPU keeps searchsorted+gather.
        """
        if jax.default_backend() != "tpu":
            idx, found = self.lookup(cells)
            return self.means[idx], self.covs[idx], found
        return self._lookup_gaussians_onehot(cells)

    def _lookup_gaussians_onehot(self, cells: Array) -> tuple[Array, Array, Array]:
        from beluga_tpu.ops.pallas_ndt import ndt_probe

        d = self.dim
        q = encode_cells(cells)  # u32[...]
        m = self.keys.shape[0]
        live = jnp.arange(m) < self.num_cells
        keys = jnp.where(live, self.keys, jnp.uint32(0xFFFFFFFF))
        # hi/lo bf16-grid planes reconstruct f32 values to ~2^-16 relative;
        # exactness to the gather path is asserted at 1e-4 by tests (the
        # NDT likelihood tolerances are far looser than that).  The hi
        # plane is a bit-pattern truncation: a bf16 round-trip residual is
        # elided to zero under --xla_allow_excess_precision (see
        # ops/pallas_resample.py:trunc_bf16).
        from beluga_tpu.ops.pallas_resample import trunc_bf16

        packed = jnp.concatenate(
            [self.means, self.covs.reshape(m, d * d)], axis=-1
        ).T  # [D + D*D, M]
        hi = trunc_bf16(packed)
        lo = packed - hi
        planes = jnp.concatenate([hi, lo], axis=0)  # [2*(D+D*D), M]

        vals2, found = ndt_probe(
            keys, planes, q, interpret=jax.default_backend() != "tpu"
        )
        k = d + d * d
        vals = vals2[..., :k] + vals2[..., k:]
        means = vals[..., :d]
        covs = vals[..., d:].reshape(q.shape + (d, d))
        # unfound queries fall back to cell 0's Gaussian like lookup();
        # callers mask by `found`
        means = jnp.where(found[..., None], means, self.means[0])
        covs = jnp.where(found[..., None, None], covs, self.covs[0])
        return means, covs, found


def make_ndt_map(cells, means, covs, resolution: float) -> NdtMap:
    """Build the sorted table from host arrays."""
    cells = np.asarray(cells, np.int32)
    means = np.asarray(means, np.float32)
    covs = np.asarray(covs, np.float32)
    n, d = cells.shape
    if n == 0:  # noqa: SIM108  # keep one sentinel row so gathers stay well-formed
        return NdtMap(
            keys=jnp.full((1,), 0xFFFFFFFF, jnp.uint32),
            means=jnp.zeros((1, d or 2), jnp.float32),
            covs=jnp.broadcast_to(jnp.eye(d or 2, dtype=jnp.float32), (1, d or 2, d or 2)),
            num_cells=jnp.int32(0),
            resolution=jnp.float32(resolution),
        )
    # encode on host (map loads must not dispatch eager device ops)
    if d == 2:
        keys = (
            ((cells[:, 0].astype(np.int64) + _BIAS2) << _BITS2)
            | ((cells[:, 1].astype(np.int64) + _BIAS2) & ((1 << _BITS2) - 1))
        ).astype(np.uint32)
    else:
        m = (1 << _BITS3) - 1
        keys = (
            (((cells[:, 0].astype(np.int64) + _BIAS3) & m) << (2 * _BITS3))
            | (((cells[:, 1].astype(np.int64) + _BIAS3) & m) << _BITS3)
            | ((cells[:, 2].astype(np.int64) + _BIAS3) & m)
        ).astype(np.uint32)
    order = np.argsort(keys, kind="stable")
    return NdtMap(
        keys=jnp.asarray(keys[order]),
        means=jnp.asarray(means[order]),
        covs=jnp.asarray(covs[order]),
        num_cells=jnp.int32(n),
        resolution=jnp.float32(resolution),
    )


def load_ndt_hdf5(path: str) -> NdtMap:
    """Load an NDT map from the reference HDF5 layout
    (ndt_sensor_model.hpp:246-320)."""
    import h5py

    with h5py.File(path, "r") as f:
        resolution = float(np.asarray(f["resolution"]))
        cells = np.asarray(f["cells"])
        means = np.asarray(f["means"])
        covs = np.asarray(f["covariances"])
    return make_ndt_map(cells, means, covs, resolution)
