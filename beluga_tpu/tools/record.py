"""Synthetic sensor-stream recorder (regenerates the missing bag payload).

The reference ships the ``perfect_odometry`` rosbag only as metadata in this
snapshot; this tool regenerates an equivalent stream — a collision-free
trajectory through a map with simulated LDS-01 scans and perfect odometry —
in the .npz format consumed by ``beluga_tpu.tools.localize``.

Usage:
  python -m beluga_tpu.tools.record --map map.yaml --output stream.npz \
      --steps 200 --start -1.7 0.5
"""

from __future__ import annotations

import argparse

import numpy as np


def record(map_yaml, output_npz, steps=200, start=(-1.7, 0.5), seed=3,
           num_beams=360, max_range=3.5, noise_sigma=0.01):
    import jax

    from beluga_tpu.io.replay import ScanSimulator, ScanSpec, drive_trajectory
    from beluga_tpu.lie import SE2
    from beluga_tpu.maps.occupancy import load_pgm_yaml

    grid = load_pgm_yaml(map_yaml)
    traj = drive_trajectory(grid, start_xy=tuple(start), num_steps=steps, seed=seed)
    spec = ScanSpec(num_beams=num_beams, max_range=max_range, max_beams=num_beams)
    sim = ScanSimulator(grid, spec)

    rng = np.random.default_rng(seed)
    scans = np.full((steps, num_beams), np.nan, np.float32)
    for t, (x, y, yaw) in enumerate(traj):
        pose = SE2.from_xytheta(float(x), float(y), float(yaw))
        dist, hit = sim._cast(pose)
        d = np.asarray(jax.device_get(dist)) + rng.normal(0, noise_sigma, num_beams)
        h = np.asarray(jax.device_get(hit))
        scans[t, h] = d[h]

    np.savez_compressed(
        output_npz,
        odom=traj,  # perfect odometry: odom == ground truth
        ground_truth=traj,
        scans=scans,
        angle_min=-np.pi,
        angle_increment=2 * np.pi / num_beams,
        range_min=0.12,
        range_max=max_range,
    )
    return traj, scans


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--start", type=float, nargs=2, default=(-1.7, 0.5))
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                   help="force the JAX backend (see localize.py)")
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    traj, scans = record(args.map, args.output, args.steps, args.start, args.seed)
    print(f"recorded {len(traj)} scans to {args.output}")


if __name__ == "__main__":
    main()
