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
