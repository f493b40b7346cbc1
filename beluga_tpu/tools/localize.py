"""Offline localization CLI — the executable-node / bag-replay analog.

Replays a recorded sensor stream (an .npz file with odometry poses and
laser scans) through the AMCL node and writes the estimated trajectory +
accuracy metrics. This is the middleware-free counterpart of running
beluga_amcl's node against a rosbag (beluga_example/).

Stream format (.npz):
  odom:           f64[T, 3]  (x, y, yaw) base pose in odom frame per scan
  scans:          f32[T, B]  ranges (NaN/inf = invalid)
  angle_min:      f64 scalar
  angle_increment: f64 scalar
  range_min/range_max: f64 scalars (optional)
  ground_truth:   f64[T, 3]  optional, enables APE reporting

Usage:
  python -m beluga_tpu.tools.localize --map map.yaml --params amcl.yaml \
      --input stream.npz --output trajectory.npz
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def run(map_yaml, input_npz, output_npz=None, params_yaml=None,
        initial_pose=None, scan_driven=False):
    from beluga_tpu.io.config import AmclNodeConfig, load_config
    from beluga_tpu.maps.occupancy import load_pgm_yaml
    from beluga_tpu.node import AmclNode
    from beluga_tpu.utils.metrics import ape
    from beluga_tpu.utils.profiling import LatencyRecorder

    cfg = load_config(params_yaml) if params_yaml else AmclNodeConfig()
    clouds = None
    if str(input_npz).endswith((".db3", ".sqlite3")):
        # rosbag2 bagfile: decode CDR blobs directly (io/rosbag.py) — the
        # reference's bag-replay entry point.  A bag carrying PointCloud2
        # instead of LaserScan traffic replays through the node's
        # point-cloud input (amcl_node.cpp:236-239 alternative sensor)
        from beluga_tpu.io.rosbag import (
            _CLOUD_TYPES,
            _SCAN_TYPES,
            read_bag_cloud_stream,
            read_bag_stream,
            read_bag_topics,
        )

        types = {t for _, (_, t, _) in read_bag_topics(input_npz).items()}
        if types & set(_SCAN_TYPES):
            data = read_bag_stream(input_npz)
        elif types & set(_CLOUD_TYPES):
            data = read_bag_cloud_stream(input_npz)
            clouds = np.asarray(data["clouds"], np.float32)
        else:
            raise ValueError("bag has neither LaserScan nor PointCloud2")
    else:
        data = np.load(input_npz)
    odom = np.asarray(data["odom"], np.float64)
    if clouds is None:
        scans = np.asarray(data["scans"], np.float32)
        angle_min = float(data["angle_min"])
        angle_inc = float(data["angle_increment"])
        range_min = float(data["range_min"]) if "range_min" in data else cfg.laser_min_range
        range_max = float(data["range_max"]) if "range_max" in data else min(cfg.laser_max_range, 1e9)

    node = AmclNode(cfg)
    node.set_map(load_pgm_yaml(map_yaml))
    if initial_pose is not None:
        node.set_initial_pose(*initial_pose)
    elif cfg.set_initial_pose:
        pass  # set_map already applied the config pose
    elif "ground_truth" in data:
        node.set_initial_pose(*data["ground_truth"][0])
    else:
        node.global_localization()

    if scan_driven:
        # one device program for the whole stream: host prepares every
        # scan up front (the same native adapter work the per-scan path
        # does), then lax.scan drives the filter — no per-scan dispatch
        import time as _time

        import jax

        from beluga_tpu.io.replay import replay_on_device

        t_prep = _time.monotonic()
        mb = cfg.max_beams
        pts_all = np.zeros((len(odom), mb, 2), np.float32)
        mask_all = np.zeros((len(odom), mb), bool)
        for t in range(len(odom)):
            if clouds is not None:
                pts_all[t], mask_all[t] = node.prepare_point_cloud(clouds[t])
            else:
                pts_all[t], mask_all[t] = node.prepare_scan(
                    scans[t], angle_min, angle_inc, range_min, range_max
                )
        prep_s = _time.monotonic() - t_prep

        runner = jax.jit(lambda st, o, p, m: replay_on_device(
            node.params, node._models, node._ctx, st, o, p, m))
        t0 = _time.monotonic()
        _, ests = runner(node._state, odom.astype(np.float32),
                         pts_all, mask_all)
        jax.block_until_ready(ests)
        wall = _time.monotonic() - t0
        valid = np.asarray(ests.valid)
        est_idx = np.nonzero(valid)[0].astype(np.int64)
        est = np.stack(
            [np.asarray(ests.pose.x), np.asarray(ests.pose.y),
             np.asarray(ests.pose.theta)], -1)[est_idx]
        summary = {
            "updates": int(len(est)), "scans": int(len(odom)),
            "latency": {"mode": "scan_driven",
                        "device_wall_s": round(wall, 3),
                        "per_scan_ms": round(
                            wall / max(len(odom), 1) * 1e3, 3),
                        "host_prep_s": round(prep_s, 3)},
        }
    else:
        recorder = LatencyRecorder()
        est, est_idx = [], []
        for t in range(len(odom)):
            with recorder.measure():
                if clouds is not None:
                    res = node.handle_point_cloud(odom[t], clouds[t])
                else:
                    res = node.handle_laser_scan(
                        odom[t], scans[t], angle_min, angle_inc, range_min,
                        range_max,
                    )
            if res.valid:
                est.append(res.pose)
                est_idx.append(t)

        est = np.asarray(est)
        est_idx = np.asarray(est_idx, np.int64)
        summary = {"updates": int(len(est)), "scans": int(len(odom)),
                   "latency": recorder.summary()}
    if "ground_truth" in data and len(est):
        gt = np.asarray(data["ground_truth"], np.float64)[est_idx]
        summary["ape"] = ape(est, gt)

    if output_npz:
        np.savez_compressed(
            output_npz, estimates=est, estimate_indices=est_idx,
            summary=json.dumps(summary),
        )
    return summary


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--map", required=True, help="map YAML (PGM + metadata)")
    p.add_argument("--input", required=True, help="sensor stream .npz")
    p.add_argument("--params", default=None, help="nav2-style parameter YAML")
    p.add_argument("--output", default=None, help="trajectory output .npz")
    p.add_argument("--initial-pose", type=float, nargs=3, default=None,
                   metavar=("X", "Y", "YAW"))
    p.add_argument("--scan-driven", action="store_true",
                   help="replay the whole stream as one on-device lax.scan "
                        "program (no per-scan host dispatch)")
    p.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                   help="force the JAX backend (some environments "
                        "pre-register a TPU plugin that wins over the "
                        "JAX_PLATFORMS env var; this applies the config "
                        "override after import, which is authoritative)")
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    summary = run(args.map, args.input, args.output, args.params,
                  args.initial_pose, scan_driven=args.scan_driven)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
