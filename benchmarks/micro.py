"""Per-kernel micro-benchmarks — the analog of the reference's
Google-Benchmark tier (beluga/test/benchmark/benchmark_*.cpp).

Times each hot kernel in isolation on whatever backend is active and
prints one JSON line per kernel:

    python -m benchmarks.micro [--particles N] [--beams B] [--iters K]

On remote TPU backends, run after a synchronous-mode switch (see
NOTES.md) or treat the numbers as enqueue rates.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--particles", type=int, default=4096)
    parser.add_argument("--beams", type=int, default=60)
    parser.add_argument("--grid-size", type=int, default=384)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args(argv)

    import os

    import jax

    # the axon TPU plugin rewrites jax_platforms at startup; re-assert the
    # user's JAX_PLATFORMS choice through the config (see tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from beluga_tpu.algorithms.cluster import cluster_based_estimate
    from beluga_tpu.algorithms.estimation import estimate_se2
    from beluga_tpu.algorithms.kld import kld_active_count
    from beluga_tpu.filters.amcl import AmclParams, default_hash_state
    from beluga_tpu.filters.builders import _make_field_codes
    from beluga_tpu.lie import SE2
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
    from beluga_tpu.models.sensor.likelihood_field import (
        LikelihoodFieldParams,
        likelihood_field_weights,
        likelihood_field_weights_codebook,
        make_likelihood_field,
    )
    from beluga_tpu.ops.distance_transform import squared_distance_transform
    from beluga_tpu.ops.raycast import cast_rays
    from beluga_tpu.ops.resample import RESAMPLERS

    n, b, g = args.particles, args.beams, args.grid_size
    rng = np.random.default_rng(0)
    data = np.zeros((g, g), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    for _ in range(24):
        r, c = rng.integers(10, g - 20, 2)
        data[r : r + 8, c : c + 8] = OCCUPIED_VALUE
    grid = make_grid(data, 0.05)
    lfp = LikelihoodFieldParams()
    field = make_likelihood_field(lfp, grid)
    half = g * 0.05 / 2
    states = SE2.from_xytheta(
        jnp.asarray(rng.uniform(1, 2 * half - 1, n), jnp.float32),
        jnp.asarray(rng.uniform(1, 2 * half - 1, n), jnp.float32),
        jnp.asarray(rng.uniform(-3.14, 3.14, n), jnp.float32),
    )
    pts = jnp.asarray(rng.uniform(-2, 2, (b, 2)), jnp.float32)
    mask = jnp.ones(b, bool)
    w = jnp.asarray(rng.random(n), jnp.float32)
    keys = jax.random.PRNGKey(0)
    params = AmclParams(max_particles=n, min_particles=n // 4)

    rows = {}

    def bench(name, fn, *a, unit_count=None):
        f = jax.jit(fn)
        dt = _timeit(f, *a, iters=args.iters)
        rows[name] = dt
        out = {"kernel": name, "ms": round(dt * 1e3, 4)}
        if unit_count:
            out["per_s"] = round(unit_count / dt)
        print(json.dumps(out))

    bench("distance_transform", lambda m: squared_distance_transform(m, grid.resolution, 100.0),
          grid.obstacle_mask, unit_count=g * g)
    bench("likelihood_field_precompute", lambda gr: make_likelihood_field(lfp, gr).values,
          grid, unit_count=g * g)
    bench("lf_reweight_gather",
          lambda s: likelihood_field_weights(field, s, pts, mask, lookup_mode="gather"),
          states, unit_count=n * b)
    if jax.default_backend() == "tpu":
        codes_book = _make_field_codes(field, lfp, grid)
        bench("lf_reweight_codebook_pallas",
              lambda s: likelihood_field_weights_codebook(field, codes_book, s, pts, mask),
              states, unit_count=n * b)
    bench("spatial_hash", lambda s: default_hash_state(params, s), states,
          unit_count=n)
    hashes = jax.jit(lambda s: default_hash_state(params, s))(states)
    bench("kld_active_count",
          lambda h: kld_active_count(h, n // 4, n, 0.05, 3.0), hashes, unit_count=n)
    for name, fn in RESAMPLERS.items():
        bench(f"resample_{name}", lambda k, ww, fn=fn: fn(k, ww, n), keys, w,
              unit_count=n)
    if jax.default_backend() == "tpu":
        from beluga_tpu.ops.pallas_resample import resample_take_tree

        u = jax.random.uniform(keys, (n,))
        bench("resample_fused_pallas",
              lambda ww, uu: resample_take_tree(ww, uu, states).x, w, u,
              unit_count=n)
    bench("estimate_se2", lambda s, ww: estimate_se2(s, ww, ww > -1)[0].x,
          states, w, unit_count=n)
    bench("cluster_based_estimate",
          lambda s, ww: cluster_based_estimate(s, ww, ww > -1)[0].x,
          states, w, unit_count=n)
    src = jnp.broadcast_to(jnp.asarray([half, half], jnp.float32), (256, 2))
    ang = jnp.linspace(-np.pi, np.pi, 256, endpoint=False)
    dirs = jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)
    bench("raycast_256_rays", lambda s, d: cast_rays(grid, s, d, 5.0)[0],
          src, dirs, unit_count=256)

    if jax.default_backend() == "tpu":
        from beluga_tpu.models.sensor.beam import BeamModelParams
        from beluga_tpu.models.sensor.beam_lut import (
            beam_lut_weights, build_range_lut)
        from beluga_tpu.ops.pallas_beam_lut import build_lut_bf16

        bp = BeamModelParams(beam_max_range=4.0)
        lut = build_range_lut(grid, max_range=4.0, n_bearings=128)
        lut_bf16 = build_lut_bf16(lut.ranges)
        bench("beam_lut_windowed_reweight",
              lambda s: beam_lut_weights(bp, lut, s, pts, mask,
                                         lut_bf16=lut_bf16),
              states, unit_count=n * b)


if __name__ == "__main__":
    main()
