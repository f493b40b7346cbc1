"""HBM-resident dense 2D occupancy grid.

TPU replacement for the reference's CRTP grid stack
(``sensor/data/{regular_grid,dense_grid,linear_grid,occupancy_grid}.hpp``):
one dataclass holding the whole grid as a dense ``int8[H, W]`` array plus
precomputed boolean masks, because on TPU the natural access pattern is a
vectorized gather over millions of (particle, beam) queries rather than
scalar ``data_at`` calls.

Cell-space conventions are identical to the reference:
  * ``cell_near(p) = floor(p / resolution)``           (regular_grid.hpp:76-80)
  * ``coordinates_at(c) = (c + 0.5) * resolution``     (regular_grid.hpp:88-91)
  * row-major ``index = y * width + x``                (linear_grid.hpp:73-76)
  * ``origin`` maps grid-local coordinates to the world frame; out-of-bounds
    cells are treated as non-free (occupancy_grid.hpp:101-106).

Value interpretation is the standard ROS trinary
(beluga_ros/occupancy_grid.hpp:48-64): free == 0, unknown == -1,
occupied == 100.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.lie import SE2, SO2

Array = jax.Array

FREE_VALUE = 0
UNKNOWN_VALUE = -1
OCCUPIED_VALUE = 100


def _dc(cls, meta=()):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls) if f.name not in meta]
    return jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=list(meta)
    )


@(lambda c: _dc(c, meta=("resolution_hint", "origin_hint")))
class OccupancyGrid:
    """Dense trinary occupancy grid in HBM.

    Attributes:
      data: ``int8[H, W]`` cell values (ROS trinary).
      resolution: scalar ``f32`` meters per cell.
      origin: ``SE2`` transform from grid-local to world coordinates.
      free_xy: ``f32[H*W, 2]`` world coordinates of free-cell centroids,
        packed in the prefix (padding beyond ``num_free``). Precomputed for
        uniform free-cell sampling (global localization / recovery).
      num_free: scalar ``i32`` count of valid entries in ``free_xy``.
      resolution_hint / origin_hint: host-side static copies of the
        resolution and origin pose. Device->host readbacks are extremely
        expensive on remote-execution backends (and poison subsequent
        dispatch latency), so anything host code needs is kept as pytree
        *metadata* from construction time.
    """

    data: Array
    resolution: Array
    origin: SE2
    free_xy: Array
    num_free: Array
    resolution_hint: float
    origin_hint: tuple

    @property
    def height(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]

    # -- masks (occupancy_grid.hpp:183-213) --------------------------------

    @property
    def free_mask(self) -> Array:
        return self.data == FREE_VALUE

    @property
    def obstacle_mask(self) -> Array:
        return self.data == OCCUPIED_VALUE

    @property
    def unknown_mask(self) -> Array:
        return self.data == UNKNOWN_VALUE

    def obstacle_edge_mask(self) -> Array:
        """Occupied cells 4-adjacent to at least one free cell
        (occupancy_grid.hpp:191-206)."""
        free = self.free_mask
        pad = jnp.pad(free, 1, constant_values=False)
        any_free_neighbor = (
            pad[2:, 1:-1] | pad[:-2, 1:-1] | pad[1:-1, 2:] | pad[1:-1, :-2]
        )
        return self.obstacle_mask & any_free_neighbor

    # -- cell math ----------------------------------------------------------

    def cell_near(self, p_local: Array) -> Array:
        """floor(p / resolution) for local-frame points ``[..., 2] -> i32[..., 2]``."""
        return jnp.floor(p_local / self.resolution).astype(jnp.int32)

    def coordinates_at(self, cells: Array) -> Array:
        """Cell centroids in local frame for ``i32[..., 2]`` cell coords."""
        return (cells.astype(jnp.float32) + 0.5) * self.resolution

    def contains(self, cells: Array) -> Array:
        x, y = cells[..., 0], cells[..., 1]
        return (x >= 0) & (x < self.width) & (y >= 0) & (y < self.height)

    def value_at(self, cells: Array, fill: int = UNKNOWN_VALUE) -> Array:
        """Gather cell values; out-of-bounds reads return ``fill``."""
        inside = self.contains(cells)
        x = jnp.clip(cells[..., 0], 0, self.width - 1)
        y = jnp.clip(cells[..., 1], 0, self.height - 1)
        vals = self.data[y, x]
        return jnp.where(inside, vals, jnp.int8(fill))

    def free_at(self, cells: Array) -> Array:
        """True where the cell exists and is free (occupancy_grid.hpp:101-106)."""
        return self.value_at(cells) == FREE_VALUE

    def free_near(self, p_local: Array) -> Array:
        return self.free_at(self.cell_near(p_local))


def make_grid(data, resolution: float, origin=None) -> OccupancyGrid:
    """Construct an OccupancyGrid from an ``int8[H, W]`` array.

    ``origin`` is ``None`` (identity), an ``(x, y, yaw)`` tuple of host
    floats, or an ``SE2`` (read back once — avoid on remote backends where
    device->host transfers are expensive).

    Construction is pure numpy with device *transfers* only at the end:
    eager per-op dispatch is expensive on remote-compiled backends, and maps
    load rarely while the result is reused across every update.
    """
    arr = np.asarray(data, dtype=np.int8)
    h, w = arr.shape
    if origin is None:
        ox, oy, oyaw = 0.0, 0.0, 0.0
    elif isinstance(origin, SE2):
        oxy = np.asarray(jax.device_get(origin.xy), np.float64)
        oz = np.asarray(jax.device_get(origin.rot.z), np.float64)
        ox, oy, oyaw = float(oxy[0]), float(oxy[1]), float(np.arctan2(oz[1], oz[0]))
    else:
        ox, oy, oyaw = (float(v) for v in origin)

    oc, os_ = np.cos(oyaw), np.sin(oyaw)
    origin_se2 = SE2(
        jnp.asarray(np.array([ox, oy], np.float32)),
        SO2(jnp.asarray(np.array([oc, os_], np.float32))),
    )

    free = arr == FREE_VALUE
    ys, xs = np.nonzero(free)
    order = ys.astype(np.int64) * w + xs  # row-major index order, like free_cells()
    sort = np.argsort(order, kind="stable")
    ys, xs = ys[sort], xs[sort]
    local = np.stack([(xs + 0.5) * resolution, (ys + 0.5) * resolution], axis=-1).astype(
        np.float32
    )
    num_free = len(ys)
    # world-frame coordinates (Frame::kGlobal in the reference)
    rot = np.array([[oc, -os_], [os_, oc]], np.float32)
    world = np.zeros((h * w, 2), np.float32)
    world[:num_free] = local @ rot.T + np.array([ox, oy], np.float32)

    return OccupancyGrid(
        data=jnp.asarray(arr),
        resolution=jnp.float32(resolution),
        origin=origin_se2,
        free_xy=jnp.asarray(world),
        num_free=jnp.int32(num_free),
        resolution_hint=float(resolution),
        origin_hint=(ox, oy, oyaw),
    )


def load_pgm_yaml(yaml_path: str) -> OccupancyGrid:
    """Load a ROS map_server map (PGM + YAML metadata).

    Implements the standard map_server value interpretation: pixels are
    intensities in [0, 255]; occupancy p = (255 - v) / 255 (or v/255 when
    ``negate``); p > occupied_thresh -> occupied, p < free_thresh -> free,
    otherwise unknown.  Matches what the reference consumes via
    nav_msgs/OccupancyGrid messages.
    """
    import os

    import yaml as _yaml

    with open(yaml_path) as f:
        meta = _yaml.safe_load(f)
    img_path = meta["image"]
    if not os.path.isabs(img_path):
        img_path = os.path.join(os.path.dirname(yaml_path), img_path)

    img = _read_pgm(img_path)
    p = (255.0 - img) / 255.0 if not meta.get("negate", 0) else img / 255.0
    occ = p > meta.get("occupied_thresh", 0.65)
    free = p < meta.get("free_thresh", 0.196)
    grid = np.full(img.shape, UNKNOWN_VALUE, np.int8)
    grid[occ] = OCCUPIED_VALUE
    grid[free] = FREE_VALUE
    # PGM row 0 is the top of the image; grid row 0 is the bottom (ROS).
    grid = np.flipud(grid).copy()

    ox, oy, oyaw = (float(v) for v in meta["origin"])
    return make_grid(grid, float(meta["resolution"]), (ox, oy, oyaw))


def _read_pgm(path: str) -> np.ndarray:
    """Minimal P5/P2 PGM reader (binary/ascii greyscale)."""
    with open(path, "rb") as f:
        data = f.read()

    # Parse header tokens, skipping comments.
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        # skip whitespace
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    i += 1  # single whitespace after maxval
    if magic == b"P5":
        dtype = np.uint8 if maxval < 256 else ">u2"
        img = np.frombuffer(data, dtype=dtype, count=w * h, offset=i).reshape(h, w)
        return img.astype(np.float32) * (255.0 / maxval)
    if magic == b"P2":
        vals = np.array(data[i:].split(), dtype=np.float32)
        return (vals[: w * h].reshape(h, w)) * (255.0 / maxval)
    raise ValueError(f"unsupported PGM magic {magic!r}")
