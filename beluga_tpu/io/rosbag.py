"""rosbag2 (.db3) reading — middleware-free bag replay.

The reference's system tests and examples replay rosbag2 bagfiles
(beluga_example/bags/perfect_odometry, beluga_system_tests/test/
test_system.cpp:119-272).  A rosbag2 bag is a sqlite3 database with two
tables — ``topics(id, name, type, serialization_format, ...)`` and
``messages(id, topic_id, timestamp, data)`` — whose blobs are DDS-CDR
serialized.  This module reads the database with the stdlib sqlite3 and
decodes LaserScan / Odometry blobs with the native CDR decoders
(native/beluga_io.cc), producing the same stream dict the localize CLI
consumes, so a reference user can point the pipeline at their existing
bags directly.
"""

from __future__ import annotations

import sqlite3
from pathlib import Path

import numpy as np

from beluga_tpu.io.native import (
    decode_laserscan_cdr,
    decode_odometry_cdr,
    decode_pointcloud2_cdr,
)

_SCAN_TYPES = ("sensor_msgs/msg/LaserScan",)
_CLOUD_TYPES = ("sensor_msgs/msg/PointCloud2",)
_ODOM_TYPES = ("nav_msgs/msg/Odometry",)


def _quat_to_yaw(qx, qy, qz, qw):
    return np.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz))


def read_bag_topics(bag_path: str | Path) -> dict:
    """{topic name: (id, type, serialization_format)} of a .db3 bag."""
    with sqlite3.connect(f"file:{Path(bag_path)}?mode=ro", uri=True) as db:
        rows = db.execute(
            "SELECT id, name, type, serialization_format FROM topics"
        ).fetchall()
    return {name: (tid, typ, fmt) for tid, name, typ, fmt in rows}



def _pick_topic(topics, explicit, types, name_hint=None, exclude=()):
    """Resolve a topic: explicit name (validated) or the first match."""
    if explicit is not None:
        if explicit not in topics:
            raise KeyError(f"topic {explicit!r} not in bag: {list(topics)}")
        return explicit
    for name, (_, typ, _) in sorted(topics.items()):
        if typ in types and name not in exclude:
            if name_hint is None or name_hint in name:
                return name
    return None


def _pick_odom_topics(topics, odom_topic, ground_truth_topic):
    """(odom, ground_truth) selection shared by both stream readers: the
    ground-truth topic matches by name hint; a perfect-odometry recording
    whose only Odometry topic IS the ground truth drives the filter with
    it too."""
    ground_truth_topic = _pick_topic(
        topics, ground_truth_topic, _ODOM_TYPES, name_hint="ground_truth"
    )
    odom_topic = _pick_topic(
        topics, odom_topic, _ODOM_TYPES, exclude=(ground_truth_topic or "",)
    )
    if odom_topic is None and ground_truth_topic is not None:
        odom_topic = ground_truth_topic
    if odom_topic is None:
        raise ValueError(f"no Odometry topic in bag: {list(topics)}")
    return odom_topic, ground_truth_topic


def _fetch_rows(db, topics, topic):
    tid = topics[topic][0]
    return db.execute(
        "SELECT timestamp, data FROM messages WHERE topic_id = ?"
        " ORDER BY timestamp",
        (tid,),
    ).fetchall()


def _decode_odom_series(rows):
    ts = np.asarray([t for t, _ in rows], np.int64)
    poses = np.empty((len(rows), 3), np.float64)
    for i, (_, blob) in enumerate(rows):
        p = decode_odometry_cdr(bytes(blob))
        poses[i] = (p[0], p[1], _quat_to_yaw(p[3], p[4], p[5], p[6]))
    return ts, poses


def _sample_at(ts, series, query_ts):
    """Latest series entry at or before each query stamp (tf-lookup analog)."""
    idx = np.clip(np.searchsorted(ts, query_ts, side="right") - 1, 0, len(ts) - 1)
    return series[idx]


def read_bag_stream(
    bag_path: str | Path,
    scan_topic: str | None = None,
    odom_topic: str | None = None,
    ground_truth_topic: str | None = None,
) -> dict:
    """Read a rosbag2 .db3 into the localize stream format.

    Topics default to the first LaserScan / Odometry topic found
    (``ground_truth_topic`` additionally matches names containing
    "ground_truth", like the reference bag's /odometry/ground_truth).
    Each scan is paired with the latest odometry at or before its bag
    timestamp (the tf-lookup analog).  Returns a dict with the keys the
    localize CLI documents: odom f64[T,3], scans f32[T,B], angle_min,
    angle_increment, range_min, range_max and optionally ground_truth
    f64[T,3].
    """
    bag_path = Path(bag_path)
    topics = read_bag_topics(bag_path)

    scan_topic = _pick_topic(topics, scan_topic, _SCAN_TYPES)
    if scan_topic is None:
        raise ValueError(f"no LaserScan topic in bag: {list(topics)}")
    odom_topic, ground_truth_topic = _pick_odom_topics(
        topics, odom_topic, ground_truth_topic
    )

    with sqlite3.connect(f"file:{bag_path}?mode=ro", uri=True) as db:
        scan_rows = _fetch_rows(db, topics, scan_topic)
        odom_rows = _fetch_rows(db, topics, odom_topic)
        gt_rows = (
            _fetch_rows(db, topics, ground_truth_topic)
            if ground_truth_topic else []
        )

    if not scan_rows or not odom_rows:
        raise ValueError("bag has no scan or no odometry messages")

    odom_ts, odom_xyyaw = _decode_odom_series(odom_rows)
    gt_ts, gt_xyyaw = _decode_odom_series(gt_rows) if gt_rows else (None, None)

    params0 = None
    decoded = []
    scan_ts = np.empty(len(scan_rows), np.int64)
    for i, (t, blob) in enumerate(scan_rows):
        p, r = decode_laserscan_cdr(bytes(blob))
        params0 = params0 or p
        decoded.append(r)
        scan_ts[i] = t
    # width = the longest scan (a short first scan must not truncate the
    # rest); missing tail beams stay NaN = invalid
    nb = max(len(r) for r in decoded)
    scans = np.full((len(scan_rows), nb), np.nan, np.float32)
    for i, r in enumerate(decoded):
        scans[i, : len(r)] = r

    stream = dict(
        odom=_sample_at(odom_ts, odom_xyyaw, scan_ts),
        scans=scans,
        angle_min=np.float64(params0["angle_min"]),
        angle_increment=np.float64(params0["angle_increment"]),
        range_min=np.float64(params0["range_min"]),
        range_max=np.float64(params0["range_max"]),
    )
    if gt_ts is not None:
        stream["ground_truth"] = _sample_at(gt_ts, gt_xyyaw, scan_ts)
    return stream


def read_bag_cloud_stream(
    bag_path: str | Path,
    cloud_topic: str | None = None,
    odom_topic: str | None = None,
    ground_truth_topic: str | None = None,
) -> dict:
    """Read a rosbag2 .db3 with PointCloud2 traffic into a cloud stream.

    The PointCloud2 analog of :func:`read_bag_stream` — the reference node
    accepts point clouds as an alternative to laser scans
    (beluga_amcl/src/amcl_node.cpp:236-239, wrapped by the PointCloud3 /
    SparsePointCloud3 adapters).  Each cloud is paired with the latest
    odometry at or before its bag timestamp.  Returns a dict:
    ``clouds`` f32[T, P, 3] (NaN-padded to the widest cloud),
    ``cloud_mask`` bool[T, P] (finite, in-capacity points),
    ``odom`` f64[T, 3] (x, y, yaw) and optionally ``ground_truth``.
    """
    bag_path = Path(bag_path)
    topics = read_bag_topics(bag_path)

    cloud_topic = _pick_topic(topics, cloud_topic, _CLOUD_TYPES)
    if cloud_topic is None:
        raise ValueError(f"no PointCloud2 topic in bag: {list(topics)}")
    odom_topic, ground_truth_topic = _pick_odom_topics(
        topics, odom_topic, ground_truth_topic
    )

    with sqlite3.connect(f"file:{bag_path}?mode=ro", uri=True) as db:
        cloud_rows = _fetch_rows(db, topics, cloud_topic)
        odom_rows = _fetch_rows(db, topics, odom_topic)
        gt_rows = (
            _fetch_rows(db, topics, ground_truth_topic)
            if ground_truth_topic else []
        )

    if not cloud_rows or not odom_rows:
        raise ValueError("bag has no cloud or no odometry messages")

    odom_ts, odom_xyyaw = _decode_odom_series(odom_rows)
    gt_ts, gt_xyyaw = _decode_odom_series(gt_rows) if gt_rows else (None, None)

    decoded = []
    cloud_ts = np.empty(len(cloud_rows), np.int64)
    for i, (t, blob) in enumerate(cloud_rows):
        decoded.append(decode_pointcloud2_cdr(bytes(blob)))
        cloud_ts[i] = t
    cap = max(len(p) for p in decoded)
    clouds = np.full((len(cloud_rows), cap, 3), np.nan, np.float32)
    mask = np.zeros((len(cloud_rows), cap), bool)
    for i, p in enumerate(decoded):
        clouds[i, : len(p)] = p
        mask[i, : len(p)] = np.isfinite(p).all(axis=-1)

    stream = dict(
        odom=_sample_at(odom_ts, odom_xyyaw, cloud_ts),
        clouds=clouds,
        cloud_mask=mask,
    )
    if gt_ts is not None:
        stream["ground_truth"] = _sample_at(gt_ts, gt_xyyaw, cloud_ts)
    return stream


def bag_to_npz(bag_path, output_npz, **kwargs):
    """Convert a .db3 bag to the localize stream .npz."""
    stream = read_bag_stream(bag_path, **kwargs)
    np.savez(output_npz, **stream)
    return stream
