"""beluga_tpu: a TPU-native Monte Carlo Localization framework.

A ground-up JAX/XLA re-design of the capabilities of the Beluga
particle-filter library (Ekumen-OS/beluga): dense particle-array filters,
vectorized motion/sensor models over HBM-resident maps, on-device
resampling, and mesh-sharded scale-out — see SURVEY.md for the full
blueprint and the reference mapping.
"""

from beluga_tpu.utils import jax_compat as _jax_compat

_jax_compat.apply()

from beluga_tpu.lie import SE2, SE3, SO2, SO3, to_2d, to_3d
from beluga_tpu.core.particles import ParticleSet, make_from_states
from beluga_tpu.filters.amcl import (
    AmclModels,
    AmclParams,
    AmclState,
    Estimate,
    init_state,
    update,
)
from beluga_tpu.filters.builders import (
    make_beam_filter,
    make_likelihood_field_filter,
    make_shared_scan_filter,
    update_map_ctx,
)
from beluga_tpu.filters.ndt_builders import make_ndt_filter_2d, make_ndt_filter_3d
from beluga_tpu.filters.vdb_builders import make_vdb_filter_3d
from beluga_tpu.io.config import AmclNodeConfig, load_config
from beluga_tpu.maps.ndt import load_ndt_hdf5, make_ndt_map
from beluga_tpu.maps.occupancy import OccupancyGrid, load_pgm_yaml, make_grid
from beluga_tpu.maps.voxel import make_distance_grid, make_distance_grid_from_points
from beluga_tpu.node import AmclNode
from beluga_tpu.ndt_node import NdtAmclNode, NdtAmclNode3D
from beluga_tpu.parallel.fleet import make_fleet_update, replicate, shard_fleet

__version__ = "0.1.0"

__all__ = [
    "SE2", "SE3", "SO2", "SO3", "to_2d", "to_3d",
    "ParticleSet", "make_from_states",
    "AmclModels", "AmclParams", "AmclState", "Estimate", "init_state", "update",
    "make_likelihood_field_filter", "make_beam_filter", "make_shared_scan_filter", "update_map_ctx",
    "make_ndt_filter_2d", "make_ndt_filter_3d", "make_vdb_filter_3d",
    "AmclNodeConfig", "load_config",
    "load_ndt_hdf5", "make_ndt_map",
    "OccupancyGrid", "load_pgm_yaml", "make_grid",
    "make_distance_grid", "make_distance_grid_from_points",
    "AmclNode", "NdtAmclNode", "NdtAmclNode3D",
    "make_fleet_update", "replicate", "shard_fleet",
]
