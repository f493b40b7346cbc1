"""Filter fleets: thousands of independent AMCL filters per chip.

The reference runs exactly one filter per process (SURVEY.md §2.5); the TPU
design batches B independent filters along a leading axis with ``vmap`` (the
"data-parallel" axis of this workload: multi-robot fleets, Monte Carlo
evaluation sweeps, parameter searches) and shards both the fleet and the
particle axes over a device mesh with ``jax.sharding``.

Mesh convention: axes ``("dp", "tp")`` — ``dp`` splits the fleet, ``tp``
splits each filter's particle axis.  Cross-device reductions (weight
normalization, ESS, resampling CDF, estimation moments) are emitted by XLA
GSPMD from the sharding annotations; they ride ICI on a real slice.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from beluga_tpu.filters.amcl import AmclModels, AmclParams, AmclState, update
from beluga_tpu.lie import SE2

Array = jax.Array


def make_fleet_update(params: AmclParams, models: AmclModels):
    """Returns ``fleet_update(ctx, states, odoms, points, masks)`` vmapped
    over the leading fleet axis of every argument except ``ctx`` (shared
    map)."""
    step = functools.partial(update, params, models)
    return jax.vmap(step, in_axes=(None, 0, 0, 0, 0))


def fleet_state_sharding(mesh: Mesh, state: AmclState) -> AmclState:
    """PartitionSpec tree for a batched AmclState.

    Particle-axis leaves ([B, N, ...]) shard as ("dp", "tp"); per-filter
    leaves shard as ("dp",).
    """

    def particle_spec(leaf):
        return NamedSharding(mesh, P("dp", "tp", *([None] * (leaf.ndim - 2))))

    def filter_spec(leaf):
        return NamedSharding(mesh, P("dp", *([None] * (leaf.ndim - 1))))

    particles_spec = jax.tree_util.tree_map(particle_spec, state.particles.state)
    return AmclState(
        particles=state.particles.replace(
            state=particles_spec,
            log_weight=NamedSharding(mesh, P("dp", "tp")),
            active=filter_spec(state.particles.active),
        ),
        key=filter_spec(state.key),
        thrun=jax.tree_util.tree_map(filter_spec, state.thrun),
        resample_count=filter_spec(state.resample_count),
        motion_latest=jax.tree_util.tree_map(filter_spec, state.motion_latest),
        motion_seeded=filter_spec(state.motion_seeded),
        control_prev=jax.tree_util.tree_map(filter_spec, state.control_prev),
        control_seeded=filter_spec(state.control_seeded),
        force_update=filter_spec(state.force_update),
    )


def shard_fleet(mesh: Mesh, state: AmclState) -> AmclState:
    """Place a batched fleet state onto the mesh."""
    shardings = fleet_state_sharding(mesh, state)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (e.g. the map ctx) across every device."""
    spec = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), tree)
