"""Mega-filter demo: one AMCL filter with millions of particles.

The round-4 headline configuration (bench.py primary, NOTES.md r4):
a single filter tracking through the windowed scan-LUT reweight
(`make_windowed_scan_filter`) with theta-sorted slots, selective
resampling (the reference's ESS < N/2 option), a bounded recovery pool,
and a statically scheduled slot sort — 1.5e8+ particle-updates/s on one
TPU v5e at 2M particles.  On CPU this runs a scaled-down version for
demonstration.

Run: python examples/mega_demo.py [N] [STEPS]
"""

import functools
import os
import sys
import time

sys.path.insert(0, ".")

import jax

# a pre-registered TPU plugin overrides the JAX_PLATFORMS env var at
# startup; the config update after import is authoritative (NOTES.md)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from beluga_tpu.core.random import sample_normal_se2
from beluga_tpu.filters.amcl import AmclParams, init_state, update
from beluga_tpu.filters.builders import make_windowed_scan_filter
from beluga_tpu.io.replay import ScanSimulator, ScanSpec, drive_trajectory
from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import load_pgm_yaml

MAP_YAML = "/root/reference/beluga_example/maps/turtlebot3_world.yaml"


def main():
    on_tpu = jax.default_backend() == "tpu"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 21 if on_tpu else 1 << 14)
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else (96 if on_tpu else 16)
    sub = 4  # static sort schedule: sort on sub-step 0 of each group
    steps -= steps % sub

    grid = load_pgm_yaml(MAP_YAML)
    traj = drive_trajectory(grid, start_xy=(-1.7, 0.5), num_steps=steps, seed=5)
    sim = ScanSimulator(grid, ScanSpec(num_beams=60, max_beams=60))
    key = jax.random.PRNGKey(3)
    pts_l, mask_l = [], []
    for x, y, yaw in traj:
        key, k = jax.random.split(key)
        p, m = sim.scan(SE2.from_xytheta(x, y, yaw), key=k, noise_sigma=0.01)
        pts_l.append(np.asarray(p))
        mask_l.append(np.asarray(m))
    points = jnp.asarray(np.stack(pts_l), jnp.float32).reshape(steps // sub, sub, 60, 2)
    masks = jnp.asarray(np.stack(mask_l)).reshape(steps // sub, sub, 60)
    odoms = jnp.asarray(traj, jnp.float32).reshape(steps // sub, sub, 3)

    # the r5 flagship geometry (bench.py WinlutMega; REPORT_EXTRA.md
    # ladders): fused forward kernel, (32, 128) window at dth = 2pi/64,
    # k_bins = tblk = 20 (the theta slab spans the whole LUT), 4096-lane
    # tiles
    models, ctx = make_windowed_scan_filter(
        grid, k_bins=20, win=(32, 128), dth=2.0 * np.pi / 64.0,
        max_point_radius=3.6, tile=4096 if on_tpu else 512, tblk=20,
        recovery_candidates=256,
        coverage_threshold=0.0, exact_tail_frac=0.0, fused=True,
    )
    params = AmclParams(
        max_particles=n, min_particles=n, sorted_slots=True,
        resampling="systematic", recovery_pool=min(4096, n // 4),
        selective_resampling=True, update_min_d=0.01, update_min_a=0.01,
    )
    step = functools.partial(update, params, models)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    states = sample_normal_se2(
        k1, n, SE2.from_xytheta(*traj[0]),
        jnp.diag(jnp.asarray([0.06, 0.06, 0.02], jnp.float32)),
    )
    from beluga_tpu.core.particles import tree_take

    states = tree_take(states, jnp.argsort(states.theta))
    state = init_state(k2, states, params)

    def scan_all(st, od, p, m):
        def body(s, inp):
            odi, pi, mi = inp
            ests = []
            for j in range(sub):
                oj = SE2.from_xytheta(odi[j, 0], odi[j, 1], odi[j, 2])
                s = s._replace(force_update=jnp.asarray(True))
                s, est = step(ctx, s, oj, pi[j], mi[j], sort_now=(j == 0))
                ests.append(est)
            return s, jax.tree_util.tree_map(lambda *es: jnp.stack(es), *ests)

        return jax.lax.scan(body, st, (od, p, m))

    jscan = jax.jit(scan_all)
    t0 = time.monotonic()
    st, ests = jscan(state, odoms, points, masks)
    jax.block_until_ready(st)
    print(f"compile+first run: {time.monotonic() - t0:.1f}s")

    t0 = time.perf_counter()
    st, ests = jscan(st, odoms, points, masks)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / steps
    ex = np.asarray(ests.pose.xy).reshape(steps, 2)
    gt = np.asarray(traj)
    err = np.hypot(ex[:, 0] - gt[:, 0], ex[:, 1] - gt[:, 1])
    print(
        f"{n} particles x {steps} steps: {dt*1e3:.2f} ms/step "
        f"({n/dt:.3e} particle-updates/s), tracking err "
        f"mean {err.mean():.3f} m / max {err.max():.3f} m"
    )


if __name__ == "__main__":
    main()
