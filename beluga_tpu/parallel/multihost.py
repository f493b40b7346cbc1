"""Multi-host pod driver: fleet + mega-filter scaling over ICI and DCN.

Single-host multi-chip needs nothing special (jax.devices() sees the whole
slice over ICI).  Across hosts, start this module once per host:

    python -m beluga_tpu.parallel.multihost \
        --coordinator 10.0.0.1:8476 --num-hosts 4 --host-id $ID \
        --filters-per-device 8 --particles 4096

It initializes jax.distributed, builds the global ("dp", "tp") mesh with
the dp (fleet) axis over DCN hosts and tp (particle) axis over ICI chips
— weight/ESS/resampling collectives then ride ICI, and only fleet-level
all-reduces cross DCN — and runs the weak-scaling fleet workload
(parallel/scaling.py), printing one JSON row per device count with the
scaling efficiency against the BASELINE.md >= 80% @ >= 2 hosts target.

This is the distributed-backend equivalent of the reference's (absent)
multi-process story (SURVEY.md §2.5); it is exercised on CPU with
xla_force_host_platform_device_count in tests, and compiles unchanged on
a real pod.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def build_pod_mesh(num_hosts: int, axis_names=("dp", "tp")):
    """Global mesh: hosts along dp (DCN), per-host chips along tp (ICI)."""
    import jax
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    per_host = devices.size // num_hosts
    return Mesh(devices.reshape(num_hosts, per_host), axis_names)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", default=None,
                        help="host:port of host 0 (omit for single-host)")
    parser.add_argument("--num-hosts", type=int, default=1)
    parser.add_argument("--host-id", type=int, default=0)
    parser.add_argument("--filters-per-device", type=int, default=8)
    parser.add_argument("--particles", type=int, default=4096)
    parser.add_argument("--beams", type=int, default=60)
    parser.add_argument("--grid-size", type=int, default=384)
    parser.add_argument(
        "--simulate-devices", type=int, default=0,
        help="run on N virtual CPU devices (no hardware needed); the axon "
        "TPU plugin rewrites jax_platforms at startup, so this must be "
        "forced through the config, not just the environment",
    )
    args = parser.parse_args(argv)

    import os

    if args.simulate_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.simulate_devices}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.simulate_devices:
        jax.config.update("jax_platforms", "cpu")

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )

    from beluga_tpu.filters.amcl import AmclParams
    from beluga_tpu.filters.builders import make_likelihood_field_filter
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
    from beluga_tpu.parallel.scaling import measure_fleet_scaling

    rng = np.random.default_rng(0)
    data = np.zeros((args.grid_size, args.grid_size), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    for _ in range(24):
        r, c = rng.integers(10, args.grid_size - 20, 2)
        data[r : r + 8, c : c + 8] = OCCUPIED_VALUE
    grid = make_grid(data, 0.05)
    models, ctx = make_likelihood_field_filter(grid)
    params = AmclParams(
        max_particles=args.particles, min_particles=max(args.particles // 4, 8)
    )

    rows = measure_fleet_scaling(
        models, ctx, params,
        filters_per_device=args.filters_per_device, num_beams=args.beams,
    )
    if jax.process_index() == 0:
        for row in rows:
            print(json.dumps(row))


if __name__ == "__main__":
    main()
