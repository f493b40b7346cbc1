"""beluga_tpu: a TPU-native Monte Carlo Localization framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the Beluga
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

__version__ = "0.1.0"

__all__ = [
    "SE2",
    "SE3",
    "SO2",
    "SO3",
    "to_2d",
    "to_3d",
    "ParticleSet",
    "make_from_states",
    "AmclModels",
    "AmclParams",
    "AmclState",
    "Estimate",
    "init_state",
    "update",
]
