"""Fleet-scale demo: thousands of independent AMCL filters on one program.

The config #5 story (BASELINE.md): B independent filters stepped as one
XLA program, sharded over whatever device mesh exists.  On CPU this runs a
small fleet for demonstration; on a TPU slice, raise B and the mesh covers
all chips (dp = fleet axis, tp = particle axis).

Run: python examples/fleet_demo.py [B] [N]
"""

import sys
import time

sys.path.insert(0, ".")

import os

import jax

# a pre-registered TPU plugin overrides the JAX_PLATFORMS env var at
# startup; the config update after import is authoritative (NOTES.md)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from beluga_tpu.core.random import sample_normal_se2
from beluga_tpu.filters.amcl import AmclParams, init_state
from beluga_tpu.filters.builders import make_likelihood_field_filter
from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.parallel.fleet import (
    fleet_state_sharding,
    make_fleet_update,
    replicate,
    shard_fleet,
)


def main(batch=32, num_particles=1024):
    rng = np.random.default_rng(0)
    data = np.zeros((128, 128), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[50:60, 50:60] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)

    params = AmclParams(max_particles=num_particles, min_particles=num_particles // 4)
    models, ctx = make_likelihood_field_filter(grid)

    devices = jax.devices()
    dp = min(len(devices), batch)
    mesh = Mesh(np.asarray(devices[:dp]).reshape(dp, 1), ("dp", "tp"))
    print(f"fleet: {batch} filters x {num_particles} particles on {dp} device(s)")

    @jax.jit
    def init(keys):
        def one(key):
            k1, k2 = jax.random.split(key)
            states = sample_normal_se2(
                k1, num_particles, SE2.from_xytheta(6.4, 6.4, 0.0), jnp.eye(3) * 0.3
            )
            return init_state(k2, states, params)

        return jax.vmap(one)(keys)

    state = init(jax.random.split(jax.random.PRNGKey(0), batch))
    state = shard_fleet(mesh, state)
    rctx = replicate(mesh, ctx)

    points = jnp.asarray(rng.uniform(-2, 2, (batch, 30, 2)), jnp.float32)
    masks = jnp.ones((batch, 30), bool)
    step = jax.jit(
        make_fleet_update(params, models),
        out_shardings=(fleet_state_sharding(mesh, state), None),
    )

    for i in range(5):
        odom = SE2.from_xytheta(
            jnp.full((batch,), 0.3 * (i + 1)), jnp.zeros(batch), jnp.zeros(batch)
        )
        t0 = time.perf_counter()
        state, est = step(rctx, state, odom, points, masks)
        jax.block_until_ready(state)
        print(
            f"step {i}: {1e3*(time.perf_counter()-t0):6.1f} ms  "
            f"valid={int(np.asarray(est.valid).sum())}/{batch}  "
            f"mean active={float(np.asarray(state.particles.active).mean()):.0f}"
        )


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    main(b, n)
