"""Benchmark: full-AMCL particle-update throughput on one chip.

Measures the complete filter update (differential-drive propagate →
likelihood-field reweight over 60 beams → normalize → Thrun → resample →
KLD → estimate) on a fleet of independent filters, and reports
particle-updates/s/chip against the 1e9 north-star target (BASELINE.md).

Prints ONE JSON line:
  {"metric": "particle_updates_per_s_chip", "value": N, "unit": "1/s",
   "vs_baseline": N / 1e9}

Measurement integrity: some remote-execution backends acknowledge work
before it runs, so ``block_until_ready`` measures enqueue rate, not
execution (see NOTES.md).  The bench detects this with an
impossible-throughput probe (a matmul timed above the chip's physical peak)
and, when detected, switches the session to synchronous execution with a
single device readback, then times with the measured per-call roundtrip
floor subtracted.  All reported numbers are therefore true execution rates.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

V5E_PEAK_F32_FLOPS = 2.5e14  # generous upper bound; probe threshold above this
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "540"))
_T0 = time.monotonic()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.monotonic() - _T0)


def _timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def detect_enqueue_deception():
    """Returns True when timings reflect enqueue rate, not execution."""
    import jax
    import jax.numpy as jnp

    m = 4096
    a = jnp.asarray(np.random.default_rng(0).random((m, m)), jnp.float32)
    f = jax.jit(lambda a: (a @ a).sum())
    dt = _timeit(f, a, iters=10)
    flops = 2 * m**3 / dt
    log(f"probe: matmul {m} in {dt*1e3:.3f} ms -> {flops:.2e} FLOP/s")
    return flops > V5E_PEAK_F32_FLOPS


def enter_sync_mode():
    """One tiny readback switches the relay to synchronous execution."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    jax.device_get(jnp.ones(2))
    log(f"sync-mode switch (device readback): {time.perf_counter() - t0:.0f}s")


def measure_floor():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1.0)
    floor = _timeit(f, jnp.ones(8), iters=20)
    log(f"per-call roundtrip floor: {floor*1e3:.3f} ms")
    return floor


def build(batch: int, num_particles: int, num_beams: int, grid_size: int = 384,
          lookup_mode: str = "auto"):
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
    models, ctx = make_likelihood_field_filter(grid, lookup_mode=lookup_mode)

    center = grid_size * 0.05 / 2

    @jax.jit
    def init(keys):
        def one(key):
            k1, k2 = jax.random.split(key)
            states = sample_normal_se2(
                k1, num_particles, SE2.from_xytheta(center, center, 0.0),
                jnp.eye(3) * 0.5,
            )
            return init_state(k2, states, params)

        return jax.vmap(one)(keys)

    state = init(jax.random.split(jax.random.PRNGKey(1), batch))

    points = jnp.asarray(rng.uniform(-2.0, 2.0, (batch, num_beams, 2)), jnp.float32)
    masks = jnp.ones((batch, num_beams), bool)

    fleet_update = make_fleet_update(params, models)
    step = jax.jit(fleet_update, donate_argnums=(1,))
    odoms = [
        SE2.from_xytheta(
            jnp.full((batch,), 0.3 * i), jnp.zeros(batch), jnp.zeros(batch)
        )
        for i in range(1, 9)
    ]
    return step, ctx, state, odoms, points, masks


def measure_steps(step, ctx, state, odoms, points, masks, floor=0.0, iters=8):
    import jax

    t0 = time.perf_counter()
    for i in range(iters):
        state, est = step(ctx, state, odoms[(2 + i) % len(odoms)], points, masks)
    jax.block_until_ready(state)
    return max((time.perf_counter() - t0) / iters - floor, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    deceived = detect_enqueue_deception()
    if deceived:
        log("enqueue-rate deception detected; will switch to synchronous mode")

    # Build and warm EVERYTHING before the expensive sync switch, so the
    # post-switch work is only the timed loops.
    batch, n, beams = 64, 4096, 60
    step, ctx, state, odoms, points, masks = build(batch, n, beams)
    for i in range(2):
        state, est = step(ctx, state, odoms[i % len(odoms)], points, masks)
    # secondary: the approximate low-rank fast path (stderr only)
    lr = None
    try:
        lr = build(batch, n, beams, lookup_mode="lowrank")
        lr_step, lr_ctx, lr_state = lr[0], lr[1], lr[2]
        for i in range(2):
            lr_state, _ = lr_step(lr_ctx, lr_state, odoms[i % len(odoms)], points, masks)
        lr = (lr_step, lr_ctx, lr_state)
    except Exception as e:  # noqa: BLE001
        log(f"lowrank path unavailable: {type(e).__name__}: {e}")
        lr = None
    floor_fn = jax.jit(lambda a: a + 1.0)
    floor_arg = jnp.ones(8)
    _ = floor_fn(floor_arg)
    jax.block_until_ready(state)
    log(f"compiled and warm at {time.monotonic() - _T0:.0f}s")

    sync = False
    if deceived and remaining() > 420:
        enter_sync_mode()
        sync = True
    elif deceived:
        log("WARNING: no budget for sync mode; reporting enqueue upper bound")

    floor = _timeit(floor_fn, floor_arg, iters=10) if sync else 0.0
    if sync:
        log(f"per-call roundtrip floor: {floor*1e3:.3f} ms")

    try:
        per_step = measure_steps(step, ctx, state, odoms, points, masks, floor)
        ups = batch * n / per_step
        log(f"B={batch} N={n}: {ups:.3e} particle-updates/s ({per_step*1e3:.2f} ms/step)")
    except Exception as e:  # noqa: BLE001
        log(f"measurement failed: {type(e).__name__}: {e}")
        ups = 0.0

    if lr is not None and remaining() > 20:
        try:
            lr_per_step = measure_steps(lr[0], lr[1], lr[2], odoms, points, masks, floor)
            log(
                f"lowrank fast path: {batch * n / lr_per_step:.3e} "
                f"particle-updates/s ({lr_per_step*1e3:.2f} ms/step)"
            )
        except Exception as e:  # noqa: BLE001
            log(f"lowrank measurement failed: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                "metric": "particle_updates_per_s_chip",
                "value": ups,
                "unit": "1/s",
                "vs_baseline": ups / 1e9,
                "mode": "synchronous" if sync else "async_enqueue_upper_bound",
            }
        )
    )


if __name__ == "__main__":
    main()
