"""Scaling harness smoke test on the virtual 8-device CPU mesh."""

import numpy as np

from beluga_tpu.filters.amcl import AmclParams
from beluga_tpu.filters.builders import make_likelihood_field_filter
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.parallel.scaling import measure_fleet_scaling


def test_weak_scaling_runs_on_virtual_mesh():
    data = np.zeros((60, 60), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)
    models, ctx = make_likelihood_field_filter(grid)
    params = AmclParams(max_particles=64, min_particles=16)

    rows = measure_fleet_scaling(
        models, ctx, params, filters_per_device=2, num_beams=10, iters=2,
        device_counts=[1, 2, 4, 8],
    )
    assert [r["devices"] for r in rows] == [1, 2, 4, 8]
    for r in rows:
        assert r["filters"] == 2 * r["devices"]
        assert r["filters_per_s"] > 0
    # efficiency is defined relative to the 1-device row
    assert rows[0]["efficiency"] == 1.0
