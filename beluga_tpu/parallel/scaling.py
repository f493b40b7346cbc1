"""Scaling-efficiency measurement harness.

BASELINE.md asks for filters/s scaling efficiency at 1 chip, 1 host and
N >= 2 hosts (>= 80% target).  This harness runs the same fleet workload on
growing sub-meshes of whatever devices are available and reports
throughput + efficiency; on a multi-host pod, call
``jax.distributed.initialize()`` first and the same code measures across
DCN.  On a single chip (the benchmark environment) it degenerates to the
1-device row, and the virtual CPU mesh exercises the code path in tests.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from beluga_tpu.core.random import sample_normal_se2
from beluga_tpu.filters.amcl import AmclParams, init_state
from beluga_tpu.lie import SE2
from beluga_tpu.parallel.fleet import (
    fleet_state_sharding,
    make_fleet_update,
    replicate,
    shard_fleet,
)


def measure_fleet_scaling(
    models,
    ctx,
    params: AmclParams,
    filters_per_device: int = 8,
    num_beams: int = 40,
    iters: int = 10,
    device_counts=None,
):
    """Weak-scaling sweep: B = filters_per_device * D filters on D devices.

    Returns a list of rows ``{devices, filters, steps_per_s, filters_per_s,
    efficiency}`` with efficiency relative to the smallest device count.
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]

    rng = np.random.default_rng(0)
    rows = []
    base_rate = None
    for d in device_counts:
        mesh = Mesh(np.asarray(devices[:d]).reshape(d, 1), ("dp", "tp"))
        batch = filters_per_device * d

        @jax.jit
        def init(keys):
            def one(key):
                k1, k2 = jax.random.split(key)
                states = sample_normal_se2(
                    k1, params.max_particles, SE2.from_xytheta(3.0, 3.0, 0.0),
                    jnp.eye(3) * 0.2,
                )
                return init_state(k2, states, params)

            return jax.vmap(one)(keys)

        state = init(jax.random.split(jax.random.PRNGKey(1), batch))
        state = shard_fleet(mesh, state)
        rctx = replicate(mesh, ctx)

        points = jnp.asarray(rng.uniform(-2, 2, (batch, num_beams, 2)), jnp.float32)
        masks = jnp.ones((batch, num_beams), bool)
        odoms = [
            SE2.from_xytheta(jnp.full((batch,), 0.3 * i), jnp.zeros(batch), jnp.zeros(batch))
            for i in range(1, 5)
        ]

        fleet_update = make_fleet_update(params, models)
        step = jax.jit(
            fleet_update, out_shardings=(fleet_state_sharding(mesh, state), None)
        )
        for i in range(2):
            state, _ = step(rctx, state, odoms[i % 4], points, masks)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for i in range(iters):
            state, _ = step(rctx, state, odoms[(2 + i) % 4], points, masks)
        jax.block_until_ready(state)
        dt = (time.perf_counter() - t0) / iters

        filters_per_s = batch / dt
        per_dev = filters_per_s / d
        if base_rate is None:
            base_rate = per_dev
        rows.append(
            {
                "devices": d,
                "filters": batch,
                "steps_per_s": 1.0 / dt,
                "filters_per_s": filters_per_s,
                "efficiency": per_dev / base_rate,
            }
        )
    return rows
