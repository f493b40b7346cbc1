"""rosbag2 .db3 reading + CDR decoding (native and fallback paths)."""

import sqlite3
import struct

import numpy as np
import pytest

from beluga_tpu.io import native
from beluga_tpu.io.rosbag import bag_to_npz, read_bag_stream, read_bag_topics


# ---------------------------------------------------------------------------
# CDR encoders (test oracles): XCDR1 little-endian, alignment rel. to byte 4
# ---------------------------------------------------------------------------


class CdrWriter:
    def __init__(self):
        self.buf = bytearray(b"\x00\x01\x00\x00")  # CDR_LE encapsulation

    def align(self, n):
        rem = (len(self.buf) - 4) % n
        if rem:
            self.buf += b"\x00" * (n - rem)

    def write(self, fmt, size, v):
        self.align(size)
        self.buf += struct.pack("<" + fmt, v)

    def string(self, s):
        data = s.encode() + b"\x00"
        self.write("I", 4, len(data))
        self.buf += data

    def header(self, sec=7, nsec=9, frame="odom"):
        self.write("i", 4, sec)
        self.write("I", 4, nsec)
        self.string(frame)


def encode_laserscan(ranges, angle_min=-1.5, angle_inc=0.01,
                     range_min=0.1, range_max=12.0, intensities=True):
    w = CdrWriter()
    w.header(frame="base_scan")
    for v in (angle_min, angle_min + angle_inc * (len(ranges) - 1), angle_inc,
              0.0, 0.2, range_min, range_max):
        w.write("f", 4, v)
    w.write("I", 4, len(ranges))
    for r in ranges:
        w.write("f", 4, float(r))
    if intensities:
        w.write("I", 4, len(ranges))
        for _ in ranges:
            w.write("f", 4, 1.0)
    return bytes(w.buf)


def encode_odometry(x, y, yaw, frame="odom", child="base_link"):
    w = CdrWriter()
    w.header(frame=frame)
    w.string(child)
    qz, qw = np.sin(yaw / 2), np.cos(yaw / 2)
    for v in (x, y, 0.0, 0.0, 0.0, qz, qw):
        w.write("d", 8, float(v))
    for _ in range(36):  # pose covariance
        w.write("d", 8, 0.0)
    # twist + its covariance
    for _ in range(6 + 36):
        w.write("d", 8, 0.0)
    return bytes(w.buf)


@pytest.fixture(params=["native", "fallback"])
def decoder_mode(request, monkeypatch):
    if request.param == "fallback":
        monkeypatch.setattr(native, "_load", lambda: None)
    elif not native.native_available():
        pytest.skip("native library unavailable")
    return request.param


class TestCdrDecode:
    def test_laserscan_roundtrip(self, decoder_mode):
        ranges = np.asarray([1.0, 2.5, np.inf, 0.5], np.float32)
        params, got = native.decode_laserscan_cdr(encode_laserscan(ranges))
        np.testing.assert_array_equal(got, ranges)
        assert params["angle_min"] == pytest.approx(-1.5)
        assert params["angle_increment"] == pytest.approx(0.01)
        assert params["range_min"] == pytest.approx(0.1)
        assert params["range_max"] == pytest.approx(12.0)
        assert params["scan_time"] == pytest.approx(0.2)

    def test_odometry_roundtrip(self, decoder_mode):
        pose = native.decode_odometry_cdr(encode_odometry(1.5, -2.25, 0.7))
        assert pose[0] == pytest.approx(1.5)
        assert pose[1] == pytest.approx(-2.25)
        yaw = 2 * np.arctan2(pose[5], pose[6])
        assert yaw == pytest.approx(0.7, abs=1e-12)

    def test_header_stamp(self, decoder_mode):
        sec, nsec = native.decode_header_stamp_cdr(encode_laserscan([1.0]))
        assert (sec, nsec) == (7, 9)

    def test_big_endian_rejected(self, decoder_mode):
        blob = bytearray(encode_laserscan([1.0]))
        blob[1] = 0x00  # CDR_BE
        with pytest.raises(ValueError):
            native.decode_laserscan_cdr(bytes(blob))

    def test_truncated_blobs_rejected(self, decoder_mode):
        """A failed cursor must stay failed: blobs truncated inside the
        read region raise instead of silently decoding garbage from
        re-aligned positions."""
        scan = encode_laserscan([1.0, 2.0, 3.0], intensities=False)
        for cut in (5, 12, 30, len(scan) - 2):
            with pytest.raises(ValueError):
                native.decode_laserscan_cdr(scan[:cut])
        odom = encode_odometry(1.0, 2.0, 0.5)
        # pose region ends after header + child_frame_id + 7 doubles
        for cut in (5, 12, 40, 60):
            with pytest.raises(ValueError):
                native.decode_odometry_cdr(odom[:cut])

    def test_native_matches_fallback(self):
        if not native.native_available():
            pytest.skip("native library unavailable")
        ranges = np.asarray(np.linspace(0.2, 9.0, 37), np.float32)
        blob = encode_laserscan(ranges)
        p1, r1 = native.decode_laserscan_cdr(blob)
        lib = native._load
        try:
            native._load = lambda: None
            p2, r2 = native.decode_laserscan_cdr(blob)
        finally:
            native._load = lib
        assert p1 == p2
        np.testing.assert_array_equal(r1, r2)


# ---------------------------------------------------------------------------
# synthetic .db3 bag
# ---------------------------------------------------------------------------


def make_bag(path, n_scans=6):
    db = sqlite3.connect(path)
    db.execute(
        "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,"
        " serialization_format TEXT, offered_qos_profiles TEXT)"
    )
    db.execute(
        "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,"
        " timestamp INTEGER, data BLOB)"
    )
    topics = [
        (1, "/scan", "sensor_msgs/msg/LaserScan", "cdr", ""),
        (2, "/odom", "nav_msgs/msg/Odometry", "cdr", ""),
        (3, "/odometry/ground_truth", "nav_msgs/msg/Odometry", "cdr", ""),
    ]
    db.executemany("INSERT INTO topics VALUES (?,?,?,?,?)", topics)
    mid = 1
    for t in range(n_scans):
        ts = 1000 + 100 * t
        # odometry slightly before each scan; ground truth offset by +1 m
        db.execute("INSERT INTO messages VALUES (?,?,?,?)",
                   (mid, 2, ts - 5, encode_odometry(0.1 * t, 0.0, 0.05 * t)))
        mid += 1
        db.execute("INSERT INTO messages VALUES (?,?,?,?)",
                   (mid, 3, ts - 5, encode_odometry(0.1 * t + 1.0, 0.0, 0.05 * t)))
        mid += 1
        db.execute("INSERT INTO messages VALUES (?,?,?,?)",
                   (mid, 1, ts, encode_laserscan([1.0 + t, 2.0, 3.0])))
        mid += 1
    db.commit()
    db.close()


class TestBagReading:
    def test_topics(self, tmp_path):
        bag = tmp_path / "test.db3"
        make_bag(bag)
        topics = read_bag_topics(bag)
        assert topics["/scan"][1] == "sensor_msgs/msg/LaserScan"
        assert len(topics) == 3

    def test_stream(self, tmp_path):
        bag = tmp_path / "test.db3"
        make_bag(bag, n_scans=5)
        s = read_bag_stream(bag)
        assert s["scans"].shape == (5, 3)
        np.testing.assert_allclose(s["scans"][:, 0], 1.0 + np.arange(5))
        # odom paired with the latest message at/before each scan stamp
        np.testing.assert_allclose(s["odom"][:, 0], 0.1 * np.arange(5), atol=1e-12)
        np.testing.assert_allclose(s["odom"][:, 2], 0.05 * np.arange(5), atol=1e-12)
        # ground-truth topic auto-detected by name, not picked as odom
        np.testing.assert_allclose(
            s["ground_truth"][:, 0], 0.1 * np.arange(5) + 1.0, atol=1e-12
        )
        assert float(s["angle_min"]) == pytest.approx(-1.5)

    def test_npz_roundtrip(self, tmp_path):
        bag = tmp_path / "test.db3"
        make_bag(bag)
        out = tmp_path / "stream.npz"
        bag_to_npz(bag, out)
        data = np.load(out)
        assert "odom" in data and "scans" in data and "ground_truth" in data

    def test_ground_truth_only_bag(self, tmp_path):
        """A bag whose only Odometry topic is the ground truth drives the
        filter with it instead of raising."""
        bag = tmp_path / "gt_only.db3"
        db = sqlite3.connect(bag)
        db.execute(
            "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,"
            " serialization_format TEXT, offered_qos_profiles TEXT)"
        )
        db.execute(
            "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,"
            " timestamp INTEGER, data BLOB)"
        )
        db.executemany("INSERT INTO topics VALUES (?,?,?,?,?)", [
            (1, "/scan", "sensor_msgs/msg/LaserScan", "cdr", ""),
            (2, "/odometry/ground_truth", "nav_msgs/msg/Odometry", "cdr", ""),
        ])
        mid = 1
        for t in range(3):
            db.execute("INSERT INTO messages VALUES (?,?,?,?)",
                       (mid, 2, 1000 + 100 * t - 5,
                        encode_odometry(0.1 * t, 0.0, 0.0)))
            mid += 1
            db.execute("INSERT INTO messages VALUES (?,?,?,?)",
                       (mid, 1, 1000 + 100 * t, encode_laserscan([1.0, 2.0])))
            mid += 1
        db.commit()
        db.close()
        s = read_bag_stream(bag)
        np.testing.assert_allclose(s["odom"], s["ground_truth"])

    def test_short_first_scan_does_not_truncate(self, tmp_path):
        bag = tmp_path / "short_first.db3"
        db = sqlite3.connect(bag)
        db.execute(
            "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,"
            " serialization_format TEXT, offered_qos_profiles TEXT)"
        )
        db.execute(
            "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,"
            " timestamp INTEGER, data BLOB)"
        )
        db.executemany("INSERT INTO topics VALUES (?,?,?,?,?)", [
            (1, "/scan", "sensor_msgs/msg/LaserScan", "cdr", ""),
            (2, "/odom", "nav_msgs/msg/Odometry", "cdr", ""),
        ])
        db.execute("INSERT INTO messages VALUES (1, 2, 995, ?)",
                   (encode_odometry(0, 0, 0),))
        db.execute("INSERT INTO messages VALUES (2, 1, 1000, ?)",
                   (encode_laserscan([1.0]),))  # short startup scan
        db.execute("INSERT INTO messages VALUES (3, 1, 1100, ?)",
                   (encode_laserscan([1.0, 2.0, 3.0, 4.0]),))
        db.commit()
        db.close()
        s = read_bag_stream(bag)
        assert s["scans"].shape == (2, 4)
        np.testing.assert_allclose(s["scans"][1], [1.0, 2.0, 3.0, 4.0])
        assert np.isnan(s["scans"][0, 1:]).all()

    def test_explicit_and_missing_topics(self, tmp_path):
        bag = tmp_path / "test.db3"
        make_bag(bag)
        s = read_bag_stream(bag, odom_topic="/odometry/ground_truth",
                            ground_truth_topic="/odom")
        np.testing.assert_allclose(s["odom"][:, 0] - 1.0, s["ground_truth"][:, 0],
                                   atol=1e-12)
        with pytest.raises(KeyError):
            read_bag_stream(bag, scan_topic="/nope")
        with pytest.raises(KeyError):
            read_bag_stream(bag, ground_truth_topic="/typo")


# ---------------------------------------------------------------------------
# PointCloud2 (dense + sparse strided layouts)
# ---------------------------------------------------------------------------


def encode_pointcloud2(
    points, datatype="f32", extra_fields=(), point_pad=0, height=1,
    row_pad=0, field_order=("x", "y", "z"),
):
    """sensor_msgs/PointCloud2 CDR oracle.

    ``points``: [N, 3].  ``extra_fields``: names of trailing scalar fields
    (same datatype) — makes the layout sparse in the reference's sense.
    ``point_pad``: extra bytes after the fields in each point;
    ``row_pad``: extra bytes per row (row_step > width * point_step).
    """
    points = np.asarray(points, np.float64)
    n = len(points)
    assert n % height == 0
    width = n // height
    scalar = 4 if datatype == "f32" else 8
    code = 7 if datatype == "f32" else 8
    names = list(field_order) + list(extra_fields)
    point_step = scalar * len(names) + point_pad
    row_step = width * point_step + row_pad

    w = CdrWriter()
    w.header(frame="lidar")
    w.write("I", 4, height)
    w.write("I", 4, width)
    w.write("I", 4, len(names))
    for i, name in enumerate(names):
        w.string(name)
        w.write("I", 4, i * scalar)  # offset
        w.write("B", 1, code)  # datatype
        w.write("I", 4, 1)  # count
    w.write("B", 1, 0)  # is_bigendian
    w.write("I", 4, point_step)
    w.write("I", 4, row_step)
    data = bytearray()
    fmt = "<f" if datatype == "f32" else "<d"
    for r in range(height):
        for c in range(width):
            p = points[r * width + c]
            for k in range(len(names)):
                v = p[k] if k < 3 else 42.0 + k
                data += struct.pack(fmt, v)
            data += b"\x00" * point_pad
        data += b"\xEE" * row_pad
    w.write("I", 4, len(data))
    w.buf += bytes(data)
    w.write("B", 1, 1)  # is_dense
    return bytes(w.buf)


class TestPointCloud2Decode:
    def test_dense_f32_roundtrip(self, decoder_mode):
        pts = np.asarray([[1.0, 2.0, 3.0], [-0.5, 0.25, 7.5]], np.float32)
        got = native.decode_pointcloud2_cdr(encode_pointcloud2(pts))
        np.testing.assert_array_equal(got, pts)

    def test_dense_f64_casts(self, decoder_mode):
        pts = np.asarray([[0.1, -0.2, 0.3], [4.0, 5.0, 6.0]])
        got = native.decode_pointcloud2_cdr(
            encode_pointcloud2(pts, datatype="f64"))
        np.testing.assert_allclose(got, pts, rtol=1e-7)

    def test_sparse_extra_fields_and_padding(self, decoder_mode):
        """The sparse layout of sparse_point_cloud.hpp:53: xyz leads, extra
        fields (intensity, ring) and point padding follow; stride honored."""
        pts = np.asarray(
            [[1.0, 2.0, 3.0], [9.0, 8.0, 7.0], [0.0, -1.0, 2.5]], np.float32
        )
        blob = encode_pointcloud2(
            pts, extra_fields=("intensity", "ring"), point_pad=6)
        got = native.decode_pointcloud2_cdr(blob)
        np.testing.assert_array_equal(got, pts)

    def test_organized_cloud_row_padding(self, decoder_mode):
        """height > 1 with row_step > width * point_step (organized cloud)."""
        pts = np.arange(24, dtype=np.float32).reshape(8, 3)
        blob = encode_pointcloud2(pts, height=2, row_pad=10)
        got = native.decode_pointcloud2_cdr(blob)
        np.testing.assert_array_equal(got, pts)

    def test_nan_points_preserved(self, decoder_mode):
        pts = np.asarray(
            [[1.0, 2.0, 3.0], [np.nan, np.nan, np.nan]], np.float32)
        got = native.decode_pointcloud2_cdr(encode_pointcloud2(pts))
        assert np.isnan(got[1]).all() and np.isfinite(got[0]).all()

    def test_non_xyz_layout_rejected(self, decoder_mode):
        pts = np.zeros((2, 3), np.float32)
        blob = encode_pointcloud2(pts, field_order=("a", "b", "c"))
        with pytest.raises(ValueError):
            native.decode_pointcloud2_cdr(blob)

    def test_truncated_rejected(self, decoder_mode):
        blob = encode_pointcloud2(np.ones((4, 3), np.float32))
        for cut in (5, 20, 40, len(blob) - 10):
            with pytest.raises(ValueError):
                native.decode_pointcloud2_cdr(blob[:cut])

    def test_native_matches_fallback(self):
        if not native.native_available():
            pytest.skip("native library unavailable")
        pts = np.asarray(np.random.default_rng(0).normal(size=(17, 3)),
                         np.float32)
        blob = encode_pointcloud2(pts, extra_fields=("intensity",),
                                  point_pad=2)
        g1 = native.decode_pointcloud2_cdr(blob)
        lib = native._load
        try:
            native._load = lambda: None
            g2 = native.decode_pointcloud2_cdr(blob)
        finally:
            native._load = lib
        np.testing.assert_array_equal(g1, g2)


def make_cloud_bag(path, n_clouds=5, datatype="f32", sparse=False):
    db = sqlite3.connect(path)
    db.execute(
        "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,"
        " serialization_format TEXT, offered_qos_profiles TEXT)"
    )
    db.execute(
        "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,"
        " timestamp INTEGER, data BLOB)"
    )
    db.executemany("INSERT INTO topics VALUES (?,?,?,?,?)", [
        (1, "/points", "sensor_msgs/msg/PointCloud2", "cdr", ""),
        (2, "/odom", "nav_msgs/msg/Odometry", "cdr", ""),
        (3, "/odometry/ground_truth", "nav_msgs/msg/Odometry", "cdr", ""),
    ])
    mid = 1
    kw = dict(extra_fields=("intensity",), point_pad=4) if sparse else {}
    for t in range(n_clouds):
        ts = 1000 + 100 * t
        db.execute("INSERT INTO messages VALUES (?,?,?,?)",
                   (mid, 2, ts - 5, encode_odometry(0.1 * t, 0.0, 0.05 * t)))
        mid += 1
        db.execute("INSERT INTO messages VALUES (?,?,?,?)",
                   (mid, 3, ts - 5,
                    encode_odometry(0.1 * t + 1.0, 0.0, 0.05 * t)))
        mid += 1
        pts = np.asarray(
            [[1.0 + t, 2.0, 0.1], [3.0, 4.0 + t, 0.2], [5.0, 6.0, 0.3 + t]])
        db.execute("INSERT INTO messages VALUES (?,?,?,?)",
                   (mid, 1, ts,
                    encode_pointcloud2(pts, datatype=datatype, **kw)))
        mid += 1
    db.commit()
    db.close()


class TestCloudBagReading:
    @pytest.mark.parametrize("sparse", [False, True])
    def test_cloud_stream(self, tmp_path, sparse):
        from beluga_tpu.io.rosbag import read_bag_cloud_stream

        bag = tmp_path / "clouds.db3"
        make_cloud_bag(bag, n_clouds=4, sparse=sparse)
        s = read_bag_cloud_stream(bag)
        assert s["clouds"].shape == (4, 3, 3)
        assert s["cloud_mask"].all()
        np.testing.assert_allclose(
            s["clouds"][:, 0, 0], 1.0 + np.arange(4), rtol=1e-6)
        np.testing.assert_allclose(s["odom"][:, 0], 0.1 * np.arange(4),
                                   atol=1e-12)
        np.testing.assert_allclose(
            s["ground_truth"][:, 0], 0.1 * np.arange(4) + 1.0, atol=1e-12)
