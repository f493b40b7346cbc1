"""Native C++ IO kernel tests (ctypes bindings + numpy-fallback parity)."""

import numpy as np
import pytest

from beluga_tpu.io import native


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.build_native(), "native toolchain unavailable"
    assert native.native_available()


class TestScanToPoints:
    def test_matches_numpy_fallback(self):
        rng = np.random.default_rng(0)
        ranges = rng.uniform(0.0, 5.0, 360).astype(np.float32)
        ranges[::17] = np.nan
        ranges[::23] = np.inf
        args = (ranges, -np.pi, 2 * np.pi / 360, 0.12, 3.5, (0.1, -0.05, 0.3))

        pts_n, mask_n = native.scan_to_points(*args)

        # force the numpy path
        lib = native._lib
        native._lib = None
        native._build_attempted = True
        so = native._SO
        native._SO = native._SO.with_suffix(".missing")
        try:
            pts_p, mask_p = native.scan_to_points(*args)
        finally:
            native._SO = so
            native._lib = lib
        np.testing.assert_array_equal(mask_n, mask_p)
        np.testing.assert_allclose(pts_n, pts_p, atol=1e-5)

    def test_range_filtering(self):
        ranges = np.array([0.05, 1.0, 10.0, np.nan], np.float32)
        pts, mask = native.scan_to_points(ranges, 0.0, 0.1, 0.12, 3.5)
        np.testing.assert_array_equal(mask, [False, True, False, False])
        np.testing.assert_allclose(pts[0], 0.0)

    def test_sensor_transform(self):
        ranges = np.array([2.0], np.float32)
        pts, mask = native.scan_to_points(
            ranges, 0.0, 0.0, 0.0, 10.0, sensor_pose=(1.0, 0.0, np.pi / 2)
        )
        np.testing.assert_allclose(pts[0], [1.0, 2.0], atol=1e-6)


class TestTakeEvenly:
    def test_endpoints_included(self):
        idx = native.take_evenly_indices(360, 60)
        assert idx[0] == 0 and idx[-1] == 359
        assert len(idx) == 60
        assert (np.diff(idx) > 0).all()

    # golden cases from beluga/test/beluga/views/test_take_evenly.cpp
    @pytest.mark.parametrize(
        "n,k,want",
        [
            (4, 2, [0, 3]),
            (5, 3, [0, 2, 4]),
            (6, 3, [0, 3, 5]),
            (9, 3, [0, 4, 8]),
            (4, 3, [0, 2, 3]),
            (10, 6, [0, 2, 4, 6, 8, 9]),
            (4, 10, [0, 1, 2, 3]),  # TakeAll: k > n returns everything
            (4, 1, [0]),
            (0, 1, []),
            (4, 0, []),
        ],
    )
    def test_reference_goldens(self, n, k, want):
        np.testing.assert_array_equal(native.take_evenly_indices(n, k), want)

    def test_native_matches_fallback(self):
        lib = native._lib
        for n, k in [(360, 60), (100, 7), (13, 5)]:
            got_native = native.take_evenly_indices(n, k)
            native._lib = None
            native._build_attempted = True
            so = native._SO
            native._SO = native._SO.with_suffix(".missing")
            try:
                got_py = native.take_evenly_indices(n, k)
            finally:
                native._SO = so
                native._lib = lib
            np.testing.assert_array_equal(got_native, got_py)


class TestPgmDecoder:
    def test_decodes_turtlebot_map(self):
        with open("/root/reference/beluga_example/maps/turtlebot3_world.pgm", "rb") as f:
            data = f.read()
        out = native.decode_pgm_trinary(data)
        assert out is not None
        assert out.shape == (384, 384)
        # matches the python loader
        from beluga_tpu.maps.occupancy import load_pgm_yaml

        grid = load_pgm_yaml("/root/reference/beluga_example/maps/turtlebot3_world.yaml")
        np.testing.assert_array_equal(out, np.asarray(grid.data))

    def test_rejects_garbage(self):
        assert native.decode_pgm_trinary(b"NOTAPGM") is None
