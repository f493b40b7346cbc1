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
