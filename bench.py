"""Benchmark: full-AMCL particle-update throughput on one chip.

Measures the complete filter update (differential-drive propagate →
likelihood-field reweight over 60 beams → normalize → Thrun → resample →
KLD → estimate) on a fleet of independent filters, and reports
particle-updates/s/chip against the 1e9 north-star target (BASELINE.md).

Prints ONE JSON line:
  {"metric": "particle_updates_per_s_chip", "value": N, "unit": "1/s",
   "vs_baseline": N / 1e9}
Secondary numbers (per-scan latency at the reference's 2000-particle
config) go to stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(batch: int, num_particles: int, num_beams: int, grid_size: int = 384):
    import jax
    import jax.numpy as jnp

    from beluga_tpu.core.random import sample_normal_se2
    from beluga_tpu.filters.amcl import AmclParams, init_state
    from beluga_tpu.filters.builders import make_likelihood_field_filter
    from beluga_tpu.lie import SE2
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
    from beluga_tpu.parallel.fleet import make_fleet_update

    rng = np.random.default_rng(0)
    data = np.zeros((grid_size, grid_size), np.int8)
    data[0, :] = data[-1, :] = OCCUPIED_VALUE
    data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    for _ in range(24):
        r, c = rng.integers(10, grid_size - 20, 2)
        data[r : r + 8, c : c + 8] = OCCUPIED_VALUE
    grid = make_grid(data, 0.05)

    params = AmclParams(
        max_particles=num_particles, min_particles=max(num_particles // 4, 8)
    )
    models, ctx = make_likelihood_field_filter(grid)

    center = grid_size * 0.05 / 2

    def one(key):
        k1, k2 = jax.random.split(key)
        states = sample_normal_se2(
            k1, num_particles, SE2.from_xytheta(center, center, 0.0), jnp.eye(3) * 0.5
        )
        return init_state(k2, states, params)

    state = jax.jit(jax.vmap(one))(jax.random.split(jax.random.PRNGKey(1), batch))

    points = jnp.asarray(
        rng.uniform(-2.0, 2.0, (batch, num_beams, 2)), jnp.float32
    )
    masks = jnp.ones((batch, num_beams), bool)

    fleet_update = make_fleet_update(params, models)
    step = jax.jit(fleet_update, donate_argnums=(1,))

    # odometry that always passes the 0.25 m motion gate
    odoms = [
        SE2.from_xytheta(jnp.full((batch,), 0.3 * i), jnp.zeros(batch), jnp.zeros(batch))
        for i in range(1, 9)
    ]
    return step, ctx, state, odoms, points, masks


def run_config(batch, num_particles, num_beams, iters=20):
    import jax

    step, ctx, state, odoms, points, masks = build(batch, num_particles, num_beams)

    # warmup / compile
    for i in range(3):
        state, est = step(ctx, state, odoms[i % len(odoms)], points, masks)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for i in range(iters):
        state, est = step(ctx, state, odoms[(3 + i) % len(odoms)], points, masks)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    per_step = dt / iters
    updates_per_s = batch * num_particles / per_step
    return updates_per_s, per_step


def bench_beam(batch=16, num_particles=1024, num_beams=40, iters=5):
    """Secondary: beam-model reweight throughput (ray casts/s)."""
    import jax
    import jax.numpy as jnp

    from beluga_tpu.lie import SE2
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
    from beluga_tpu.models.sensor.beam import BeamModelParams, beam_log_weights

    rng = np.random.default_rng(3)
    size = 384
    data = np.zeros((size, size), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    for _ in range(30):
        r, c = rng.integers(10, size - 20, 2)
        data[r : r + 6, c : c + 6] = OCCUPIED_VALUE
    grid = make_grid(data, 0.05)
    params = BeamModelParams(beam_max_range=3.5)

    states = SE2.from_xytheta(
        jnp.asarray(rng.uniform(2, 17, (batch, num_particles)), jnp.float32),
        jnp.asarray(rng.uniform(2, 17, (batch, num_particles)), jnp.float32),
        jnp.asarray(rng.uniform(-3, 3, (batch, num_particles)), jnp.float32),
    )
    points = jnp.asarray(rng.uniform(-2, 2, (batch, num_beams, 2)), jnp.float32)
    masks = jnp.ones((batch, num_beams), bool)

    f = jax.jit(
        jax.vmap(
            lambda g, s, p, m: beam_log_weights(
                params, g, s, p, m, resolution_hint=grid.resolution_hint
            ),
            in_axes=(None, 0, 0, 0),
        ),
        static_argnums=(),
    )
    out = f(grid, states, points, masks)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(grid, states, points, masks)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    rays = batch * num_particles * num_beams
    log(
        f"beam model: {rays / dt:.3e} raycasts/s "
        f"({batch}x{num_particles}x{num_beams} in {dt*1e3:.2f} ms)"
    )


def main():
    import jax

    log(f"devices: {jax.devices()}")

    # reference-parity latency config: 2000 particles, 60 beams, 1 filter
    ups_ref, lat_ref = run_config(batch=1, num_particles=2048, num_beams=60, iters=20)
    log(f"single filter (2048 particles, 60 beams): {lat_ref*1e3:.3f} ms/scan")

    try:
        bench_beam()
    except Exception as e:  # noqa: BLE001
        log(f"beam bench failed: {type(e).__name__}: {e}")

    # throughput configs: scale the fleet until the chip saturates
    best = 0.0
    for batch, n in ((64, 4096), (256, 4096), (512, 4096), (256, 8192)):
        try:
            ups, per_step = run_config(batch, n, 60, iters=10)
        except Exception as e:  # noqa: BLE001 - report and continue scaling
            log(f"config B={batch} N={n} failed: {type(e).__name__}: {e}")
            continue
        log(
            f"B={batch} N={n}: {ups:.3e} particle-updates/s ({per_step*1e3:.2f} ms/step)"
        )
        best = max(best, ups)

    print(
        json.dumps(
            {
                "metric": "particle_updates_per_s_chip",
                "value": best,
                "unit": "1/s",
                "vs_baseline": best / 1e9,
            }
        )
    )


if __name__ == "__main__":
    main()
