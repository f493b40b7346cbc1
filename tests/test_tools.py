"""record + localize CLI tools end-to-end (the bag-replay workflow)."""

import json
import os

import numpy as np

TURTLEBOT_YAML = "/root/reference/beluga_example/maps/turtlebot3_world.yaml"


def test_record_then_localize(tmp_path):
    from beluga_tpu.tools.localize import run
    from beluga_tpu.tools.record import record

    stream = os.path.join(tmp_path, "stream.npz")
    traj, scans = record(TURTLEBOT_YAML, stream, steps=50, seed=3)
    assert np.isfinite(traj).all()
    assert np.isfinite(scans[~np.isnan(scans)]).all()

    out = os.path.join(tmp_path, "out.npz")
    summary = run(TURTLEBOT_YAML, stream, output_npz=out)
    assert summary["updates"] >= 2
    assert summary["ape"]["rmse"] <= 0.9  # the system accuracy gate
    assert summary["latency"]["count"] == 50

    saved = np.load(out)
    assert len(saved["estimates"]) == summary["updates"]
    meta = json.loads(str(saved["summary"]))
    assert meta["updates"] == summary["updates"]


def test_scan_driven_replay_matches_host_driven(tmp_path):
    """--scan-driven (one on-device lax.scan program) produces the same
    update gating and estimates as the per-scan host loop."""
    from beluga_tpu.tools.localize import run
    from beluga_tpu.tools.record import record

    stream = os.path.join(tmp_path, "stream.npz")
    record(TURTLEBOT_YAML, stream, steps=40, seed=5)
    host = run(TURTLEBOT_YAML, stream,
               output_npz=os.path.join(tmp_path, "h.npz"))
    dev = run(TURTLEBOT_YAML, stream,
              output_npz=os.path.join(tmp_path, "d.npz"), scan_driven=True)
    assert dev["updates"] == host["updates"]
    assert dev["latency"]["mode"] == "scan_driven"
    he = np.load(os.path.join(tmp_path, "h.npz"))
    de = np.load(os.path.join(tmp_path, "d.npz"))
    np.testing.assert_array_equal(de["estimate_indices"],
                                  he["estimate_indices"])
    np.testing.assert_allclose(de["estimates"], he["estimates"],
                               rtol=1e-4, atol=1e-5)
    assert dev["ape"]["rmse"] <= 0.9


def test_localize_cloud_bag(tmp_path):
    """A PointCloud2-traffic .db3 bag replays through the localize CLI
    (auto-detected; the reference node's alternative sensor input),
    host-driven and scan-driven."""
    import json as _json

    import jax
    import numpy as np

    from beluga_tpu.io.replay import ScanSimulator, ScanSpec, drive_trajectory
    from beluga_tpu.lie import SE2
    from beluga_tpu.maps.occupancy import load_pgm_yaml
    from beluga_tpu.tools import localize
    from tests.test_system_bag import TURTLEBOT_YAML, _write_cloud_bag

    grid = load_pgm_yaml(TURTLEBOT_YAML)
    sim = ScanSimulator(grid, ScanSpec(num_beams=90))
    traj = drive_trajectory(grid, start_xy=(-1.7, 0.5), num_steps=14, seed=5)
    key = jax.random.PRNGKey(3)
    angles = np.linspace(-np.pi, np.pi, 90, endpoint=False)
    clouds = []
    for x, y, yaw in traj:
        key, k = jax.random.split(key)
        ranges = np.asarray(
            sim.ranges(SE2.from_xytheta(x, y, yaw), key=k, noise_sigma=0.01))
        pts = np.stack([ranges * np.cos(angles), ranges * np.sin(angles),
                        np.full_like(ranges, 0.15)], -1)
        clouds.append(pts)
    bag = tmp_path / "clouds.db3"
    _write_cloud_bag(bag, traj, clouds)

    params = tmp_path / "params.yaml"
    params.write_text(
        "max_particles: 512\nmin_particles: 128\n"
        "update_min_d: 0.05\nupdate_min_a: 0.05\n"
    )
    for extra in ([], ["--scan-driven"]):
        out = tmp_path / f"traj{len(extra)}.npz"
        summary = localize.run(
            TURTLEBOT_YAML, str(bag), str(out), str(params),
            initial_pose=tuple(traj[0]), scan_driven=bool(extra),
        )
        assert summary["updates"] >= 2
        assert summary["ape"]["rmse"] < 0.9
        saved = np.load(out, allow_pickle=True)
        assert _json.loads(str(saved["summary"]))["updates"] >= 2
