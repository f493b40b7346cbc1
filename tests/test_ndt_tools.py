"""NDT map conversion tool (the beluga_tools attic equivalent)."""

import numpy as np
import pytest

from beluga_tpu.tools.make_ndt_map import (
    fit_ndt_cells,
    grid_to_points,
    load_ply_points,
    main,
    save_ndt_hdf5,
)


def test_grid_to_points_centers():
    data = np.zeros((4, 4), np.int8)
    data[1, 2] = 100
    pts = grid_to_points(data, 0.5, origin=(10.0, 20.0))
    np.testing.assert_allclose(pts, [[10.0 + 2 * 0.5 + 0.25, 20.0 + 0.5 + 0.25]])


def test_fit_ndt_cells_reference_semantics():
    rng = np.random.default_rng(0)
    # one dense cluster in cell (0, 0), one sparse (dropped: <= 5 points)
    dense = rng.normal([0.5, 0.5], 0.05, (40, 2))
    sparse = rng.normal([3.5, 3.5], 0.05, (5, 2))
    cells, means, covs = fit_ndt_cells(
        np.concatenate([dense, sparse]), cell_size=1.0
    )
    assert len(cells) == 1
    np.testing.assert_array_equal(cells[0], [0, 0])
    np.testing.assert_allclose(means[0], dense.mean(0), atol=1e-12)
    # variance floor applied
    assert covs[0, 0, 0] >= 5e-3 and covs[0, 1, 1] >= 5e-3


def test_hdf5_roundtrip_through_loader(tmp_path):
    h5py = pytest.importorskip("h5py")  # noqa: F841
    from beluga_tpu.maps.ndt import load_ndt_hdf5

    rng = np.random.default_rng(1)
    pts = np.concatenate(
        [rng.normal([0.5, 0.5], 0.1, (30, 2)), rng.normal([2.5, 1.5], 0.1, (30, 2))]
    )
    cells, means, covs = fit_ndt_cells(pts, cell_size=1.0)
    out = tmp_path / "map.hdf5"
    save_ndt_hdf5(out, cells, means, covs, 1.0)
    m = load_ndt_hdf5(str(out))
    assert int(m.num_cells) == len(cells)


def test_cli_from_occupancy_map(tmp_path):
    pytest.importorskip("h5py")
    from beluga_tpu.maps.ndt import load_ndt_hdf5

    out = tmp_path / "world.hdf5"
    main([
        "--map", "/root/reference/beluga_example/maps/turtlebot3_world.yaml",
        "--output", str(out), "--cell-size", "0.5",
    ])
    m = load_ndt_hdf5(str(out))
    assert int(m.num_cells) > 10


def test_ply_ascii_and_binary(tmp_path):
    pts = np.asarray([[0.0, 1.0, 2.0], [3.5, -1.25, 0.5]], np.float64)
    ascii_ply = tmp_path / "a.ply"
    ascii_ply.write_text(
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
        "0.0 1.0 2.0\n3.5 -1.25 0.5\n"
    )
    np.testing.assert_allclose(load_ply_points(ascii_ply), pts)

    bin_ply = tmp_path / "b.ply"
    header = (
        b"ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
        b"property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    bin_ply.write_bytes(header + pts.astype("<f4").tobytes())
    np.testing.assert_allclose(load_ply_points(bin_ply), pts)

    bad = tmp_path / "bad.ply"
    bad.write_text("not a ply\n")
    with pytest.raises(ValueError):
        load_ply_points(bad)
