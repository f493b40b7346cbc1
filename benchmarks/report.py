"""Benchmark config-matrix runner + report generator.

The analog of the reference's ``beluga_benchmark`` package: where it runs
a nav2/beluga config matrix under ``timem`` (RSS/CPU capture,
``beluga_benchmark/timem_results.py``), compares runs
(``compare_results.py``) and publishes reports with tables/plots
(``beluga_benchmark/docs/reports/*/REPORT.md``), this module runs the
BASELINE.json config matrix on the active backend, captures per-config
latency / throughput / device-memory / host-RSS, and writes a Markdown
report plus a machine-readable JSON.

    python -m benchmarks.report [--out benchmarks/REPORT.md]
                                [--json benchmarks/report.json]
                                [--compare old_report.json]
                                [--configs 1,2,5] [--quick]

Memory capture: device peak bytes via ``device.memory_stats()`` (absent on
CPU backends -> null), host RSS via ``resource.getrusage`` (the
``timem`` analog).  ``--compare`` renders a delta column against a prior
run's JSON (the ``compare_results.py`` role).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time


def _now_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _device_mem():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:  # noqa: BLE001 - backend without memory_stats
        return None
    if not stats:
        return None
    # NOTE: peak_bytes_in_use is the allocator's PROCESS-CUMULATIVE peak —
    # configs run sequentially in one process, so a row inherits the peak
    # of every earlier (possibly hungrier) config; bytes_in_use is live
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


def _timeit(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _mem_mb(jitted, *args):
    """Per-config device-memory footprint from XLA's own executable
    accounting (arguments + outputs + temp − aliased), via
    ``compile().memory_analysis()`` — works on backends whose
    ``device.memory_stats()`` is empty (the axon remote runtime returns
    ``{}``), and is per-program rather than process-cumulative."""
    try:
        ma = jitted.lower(*args).compile().memory_analysis()
        tot = (
            ma.argument_size_in_bytes + ma.output_size_in_bytes
            + ma.temp_size_in_bytes - ma.alias_size_in_bytes
        )
        return round(tot / 2**20, 1)
    except Exception:  # noqa: BLE001 - AOT path unavailable on backend
        return None


def _mem_detail(jitted, *args):
    """Like _mem_mb but returns ``(total_mb, breakout_dict)`` from ONE
    AOT compile (the flagship step compiles in ~40-60 s on TPU — don't
    pay it twice).  The temp column shows which N regimes compile extra
    scratch (e.g. a resample-take layout change)."""
    try:
        ma = jitted.lower(*args).compile().memory_analysis()
        mb = lambda b: round(b / 2**20, 1)  # noqa: E731
        tot = (
            ma.argument_size_in_bytes + ma.output_size_in_bytes
            + ma.temp_size_in_bytes - ma.alias_size_in_bytes
        )
        return mb(tot), {
            "arg_mb": mb(ma.argument_size_in_bytes),
            "out_mb": mb(ma.output_size_in_bytes),
            "temp_mb": mb(ma.temp_size_in_bytes),
            "alias_mb": mb(ma.alias_size_in_bytes),
        }
    except Exception:  # noqa: BLE001
        return None, None


def _row(name, desc, ms_per_update, particles, extra=None, mem_mb=None):
    timed = ms_per_update == ms_per_update and ms_per_update is not None
    return {
        "config": name,
        "description": desc,
        "ms_per_update": round(ms_per_update * 1e3, 3) if timed else None,
        "particle_updates_per_s": (
            round(particles / ms_per_update, 1) if timed else None
        ),
        "device_mem": _device_mem(),
        "device_mem_mb": mem_mb,
        "host_rss_mb": round(_now_rss_mb(), 1),
        **(extra or {}),
    }


# ---------------------------------------------------------------------------
# configs (BASELINE.json matrix, single-chip rows)
# ---------------------------------------------------------------------------


def config_1_node_lf(quick):
    """#1: 2D MCL, likelihood field + diff drive, nav2 node config."""
    import jax
    import jax.numpy as jnp

    import bench as B
    from beluga_tpu.filters.amcl import AmclParams, update
    from beluga_tpu.filters.builders import make_likelihood_field_filter

    n = 2048
    built = B.build(1, n, 60, grid_size=192 if quick else 384)
    _, ctx, state, odoms, pts, mks, _ = built
    models, ctx = make_likelihood_field_filter(ctx["grid"], lookup_mode="auto")
    params = AmclParams(max_particles=n, min_particles=512)
    take0 = lambda t: jax.tree_util.tree_map(lambda l: l[0], t)  # noqa: E731
    st = take0(state)
    step = jax.jit(lambda s, o, p, m: update(params, models, ctx, s, o, p, m))

    def forced(s, o, p, m):
        s = s._replace(force_update=jnp.asarray(True))
        return step(s, o, p, m)

    s = st
    for i in range(2):
        s, _ = forced(s, take0(odoms[i]), pts[i][0], mks[i][0])
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    iters = 4 if quick else 8
    for i in range(iters):
        s, _ = forced(s, take0(odoms[2 + i]), pts[2 + i][0], mks[2 + i][0])
    jax.block_until_ready(s)
    d = (time.perf_counter() - t0) / iters
    mem = _mem_mb(step, s, take0(odoms[0]), pts[0][0], mks[0][0])
    return _row("1-node-lf", "2D MCL likelihood-field + diff-drive, "
                "2048 particles x 60 beams, single filter", d, n,
                mem_mb=mem)


def config_2_beam_kld(quick):
    """#2: AMCL parity — beam model (range LUT) + adaptive KLD."""
    import jax
    import jax.numpy as jnp

    import bench as B
    from beluga_tpu.filters.amcl import AmclParams, update
    from beluga_tpu.filters.builders import make_beam_filter
    from beluga_tpu.models.sensor.beam import BeamModelParams

    n = 2048
    built = B.build(1, n, 60, grid_size=192)
    _, ctx, state, odoms, pts, mks, _ = built
    models, ctx = make_beam_filter(
        ctx["grid"], beam_params=BeamModelParams(beam_max_range=9.0),
        use_range_lut=True,
    )
    params = AmclParams(max_particles=n, min_particles=512)
    take0 = lambda t: jax.tree_util.tree_map(lambda l: l[0], t)  # noqa: E731
    s = take0(state)
    step = jax.jit(lambda s, o, p, m: update(params, models, ctx, s, o, p, m))
    for i in range(2):
        s = s._replace(force_update=jnp.asarray(True))
        s, _ = step(s, take0(odoms[i]), pts[i][0], mks[i][0])
    jax.block_until_ready(s)
    iters = 4 if quick else 8
    t0 = time.perf_counter()
    for i in range(iters):
        s = s._replace(force_update=jnp.asarray(True))
        s, _ = step(s, take0(odoms[2 + i]), pts[2 + i][0], mks[2 + i][0])
    jax.block_until_ready(s)
    d = (time.perf_counter() - t0) / iters
    mem = _mem_mb(step, s, take0(odoms[0]), pts[0][0], mks[0][0])
    return _row("2-beam-kld", "Beam sensor model (CDDT range LUT) + "
                "adaptive KLD 512-2048, 60 beams", d, n, mem_mb=mem)


def config_3_resampling_sweep(quick):
    """#3: resampling-strategy sweep on the fleet workload."""
    import jax

    import bench as B
    from beluga_tpu.filters.amcl import AmclParams
    from beluga_tpu.filters.builders import make_likelihood_field_filter
    from beluga_tpu.parallel.fleet import make_fleet_update

    batch, n = (8, 1024) if quick else (16, 4096)
    rows = []
    for strategy in ("multinomial", "systematic", "stratified", "residual"):
        built = B.build(batch, n, 60, grid_size=192)
        _, ctx, state, odoms, pts, mks, _ = built
        models, ctx = make_likelihood_field_filter(
            ctx["grid"], lookup_mode="auto", recovery_candidates=256
        )
        params = AmclParams(
            max_particles=n, min_particles=n, resampling=strategy
        )
        step = jax.jit(make_fleet_update(params, models), donate_argnums=(1,))
        s = state
        for i in range(2):
            s, _ = step(ctx, s, odoms[i], pts[i], mks[i])
        jax.block_until_ready(s)
        iters = 3 if quick else 6
        t0 = time.perf_counter()
        for i in range(iters):
            s, _ = step(ctx, s, odoms[2 + i], pts[2 + i], mks[2 + i])
        jax.block_until_ready(s)
        d = (time.perf_counter() - t0) / iters
        mem = _mem_mb(step, ctx, s, odoms[0], pts[0], mks[0])
        rows.append(_row(
            f"3-resample-{strategy}",
            f"{strategy} resampling, fleet {batch}x{n}x60", d, batch * n,
            mem_mb=mem,
        ))
    return rows


def config_4_vdb(quick):
    """#4: 3D sparse-voxel (VDB-style) likelihood, SE3 particles."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from beluga_tpu.core.random import sample_normal_se3
    from beluga_tpu.filters.amcl import AmclParams, init_state, update
    from beluga_tpu.filters.vdb_builders import make_vdb_filter_3d
    from beluga_tpu.lie import SE3, SO3
    from beluga_tpu.maps.voxel import make_distance_grid_from_points

    n = 16384 if quick else 131072
    rng = np.random.default_rng(4)
    wpts = [[x, y, 0.0] for x in np.arange(0, 8, 0.25)
            for y in np.arange(0, 8, 0.25)]
    wpts += [[5.0, 5.0, z] for z in np.arange(0, 2.0, 0.2)]
    grid = make_distance_grid_from_points(wpts, 0.2, max_distance=5.0)
    models, ctx = make_vdb_filter_3d(grid, voxel_size_hint=0.2)
    params = AmclParams(max_particles=n, min_particles=n // 4)
    meas = np.asarray([[5.0, 5.0, z] for z in np.arange(0, 2.0, 0.2)]
                      + [[t, 0.0, 1.0] for t in np.arange(0, 8, 0.4)])
    sel = meas[rng.integers(0, len(meas), 80)]
    pts = jnp.asarray((sel - [3.0, 3.0, 0.0]).astype(np.float32))
    mask = jnp.ones(len(pts), bool)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    mean = SE3(jnp.asarray([3.0, 3.0, 0.0], jnp.float32),
               SO3.from_rpy(jnp.float32(0), jnp.float32(0), jnp.float32(0)))
    s = init_state(k2, sample_normal_se3(k1, n, mean, jnp.eye(6) * 0.05),
                   params, odom_identity=SE3.identity())
    step = jax.jit(lambda s, p, m: update(
        params, models, ctx, s._replace(force_update=jnp.asarray(True)),
        SE3.identity(), p, m))
    for _ in range(2):
        s, _ = step(s, pts, mask)
    jax.block_until_ready(s)
    iters = 3 if quick else 6
    t0 = time.perf_counter()
    for _ in range(iters):
        s, _ = step(s, pts, mask)
    jax.block_until_ready(s)
    d = (time.perf_counter() - t0) / iters
    mem = _mem_mb(step, s, pts, mask)
    return _row("4-vdb-3d", f"3D VDB-style distance-field likelihood, "
                f"{n} SE3 particles x 80 points", d, n, mem_mb=mem)


def config_5_fleet(quick):
    """#5 (single-chip row): the headline fleet workload."""
    import jax

    import bench as B
    from beluga_tpu.filters.amcl import AmclParams
    from beluga_tpu.filters.builders import make_winlut_fleet_update

    batch, n = (8, 1024) if quick else (64, 4096)
    built = B.build(batch, n, 60, grid_size=192 if quick else 384,
                    lookup_mode="codebook16")
    _, ctx, state, odoms, pts, mks, _ = built
    params = AmclParams(max_particles=n, min_particles=n, sorted_slots=True)
    wstep, wctx = make_winlut_fleet_update(
        params, ctx["grid"], k_bins=64, win=128, max_point_radius=3.6,
    )
    step = jax.jit(wstep, donate_argnums=(1,))
    s = state
    for i in range(3):
        s, _ = step(wctx, s, odoms[i], pts[i], mks[i])
    jax.block_until_ready(s)
    iters = 3 if quick else 8
    t0 = time.perf_counter()
    for i in range(iters):
        s, _ = step(wctx, s, odoms[3 + i], pts[3 + i], mks[3 + i])
    jax.block_until_ready(s)
    d = (time.perf_counter() - t0) / iters
    mem = _mem_mb(step, wctx, s, odoms[0], pts[0], mks[0])
    return _row("5-fleet-winlut", f"fleet {batch}x{n}x60, hybrid windowed-"
                "scan LUT reweight", d, batch * n, mem_mb=mem)


def config_6_fleet_scale(quick):
    """#5 at chip scale (BASELINE config #5 is 4096 filters x 50k on a
    multi-host slice): the single-chip share at 256 filters x 50k
    particles = 12.8M particles, plus a 4096-filter row at the
    per-filter N that fits HBM.  Fast path: exact codebook16 reweight —
    the measured fleet recommendation (the shared-window winlut fleet
    variant loses to it at the nav2 posterior, REPORT row 5 / NOTES r3;
    winlut is the MEGA-scale path)."""
    import jax

    import bench as B
    from beluga_tpu.filters.amcl import AmclParams
    from beluga_tpu.filters.builders import make_likelihood_field_filter
    from beluga_tpu.parallel.fleet import make_fleet_update

    rows = []
    shapes = [(16, 8192)] if quick else [(256, 51200), (4096, 4096)]
    for batch, n in shapes:
        built = B.build(batch, n, 60, grid_size=192,
                        lookup_mode="codebook16", steps=12)
        _, ctx, state, odoms, pts, mks, _ = built
        models, ctx = make_likelihood_field_filter(
            ctx["grid"], lookup_mode="codebook16", recovery_candidates=256
        )
        params = AmclParams(
            max_particles=n, min_particles=n, sorted_slots=True
        )
        step = jax.jit(make_fleet_update(params, models), donate_argnums=(1,))
        s = state
        for i in range(2):
            s, _ = step(ctx, s, odoms[i], pts[i], mks[i])
        jax.block_until_ready(s)
        iters = 2 if quick else 4
        t0 = time.perf_counter()
        for i in range(iters):
            s, _ = step(ctx, s, odoms[2 + i], pts[2 + i], mks[2 + i])
        jax.block_until_ready(s)
        d = (time.perf_counter() - t0) / iters
        mem = _mem_mb(step, ctx, s, odoms[0], pts[0], mks[0])
        rows.append(_row(
            f"6-fleet-scale-{batch}x{n}",
            f"fleet {batch}x{n}x60 codebook16 ({batch*n/1e6:.1f}M "
            f"particles, {1e3/max(d,1e-9)*batch:.0f} filter-updates/s)",
            d, batch * n, mem_mb=mem,
            extra={"filters_per_s": round(batch / d, 1)},
        ))
        del built, ctx, state, odoms, pts, mks, s
    return rows


def config_7_node_latency(quick):
    """Live-node per-update latency at nav2's operating point (2000
    particles, turtlebot3_world, adaptive KLD): p50/p90 for the
    synchronous node (reference semantics, estimate published per scan,
    amcl_node.cpp:581-647) and the pipelined node (one-scan-deferred
    readback — the dispatch round-trip overlaps the next scan's host
    work).  On remote-tunnel runtimes the synchronous floor is the
    per-dispatch round-trip (~3-4 ms, irreducible per dispatch); local
    runtimes only pay it on the readback."""
    import numpy as np

    from beluga_tpu.io.config import AmclNodeConfig
    from beluga_tpu.io.replay import ScanSimulator, ScanSpec, drive_trajectory
    from beluga_tpu.lie import SE2
    from beluga_tpu.maps.occupancy import load_pgm_yaml
    from beluga_tpu.node import AmclNode

    yaml = "/root/reference/beluga_example/maps/turtlebot3_world.yaml"
    grid = load_pgm_yaml(yaml)
    steps = 24 if quick else 80
    traj = drive_trajectory(grid, start_xy=(-1.7, 0.5), num_steps=steps,
                            seed=5)
    sim = ScanSimulator(grid, ScanSpec(num_beams=60, max_beams=60))
    scans = [np.asarray(sim.scan(SE2.from_xytheta(x, y, yaw))[0])
             for x, y, yaw in traj]
    import jax
    import jax.numpy as jnp

    # the per-dispatch tunnel roundtrip floor varies by an order of
    # magnitude across sessions (measured 2.7 -> 31 ms within one day);
    # report it per-row so the floor-dominated node latency is
    # interpretable — the node itself costs p50 - ~1 floor
    tiny = jax.jit(lambda a: a + 1.0)
    x = jnp.ones(8)
    jax.block_until_ready(tiny(x))
    t0 = time.perf_counter()
    for _ in range(8):
        jax.block_until_ready(tiny(x))
    floor_ms = (time.perf_counter() - t0) / 8 * 1e3

    rows = []
    for mode, pipelined in (("sync", False), ("pipelined", True)):
        cfg = AmclNodeConfig(
            max_particles=2000, min_particles=500, set_initial_pose=True,
            initial_pose_x=float(traj[0][0]),
            initial_pose_y=float(traj[0][1]),
            initial_pose_yaw=float(traj[0][2]),
        )
        node = AmclNode(cfg, pipelined=pipelined)
        node.set_map(grid)
        lat = []
        for i, (pose, scan) in enumerate(zip(traj, scans)):
            r = node.handle_scan(tuple(pose), scan)
            if i >= 4:  # skip compile + warmup scans
                lat.append(r.latency_s)
        if pipelined:
            node.flush()
        lat_ms = np.asarray(lat) * 1e3
        p50, p90 = np.percentile(lat_ms, 50), np.percentile(lat_ms, 90)
        rows.append(_row(
            f"7-node-latency-{mode}",
            f"live node, 2000 particles x 60 beams, turtlebot3_world "
            f"(p50 {p50:.2f} / p90 {p90:.2f} ms; tunnel dispatch floor "
            f"{floor_ms:.2f} ms INCLUDED)",
            p50 * 1e-3, 2000,
            extra={"p50_ms": round(float(p50), 3),
                   "p90_ms": round(float(p90), 3),
                   "dispatch_floor_ms": round(float(floor_ms), 3),
                   "updates": len(lat)},
        ))
    return rows


def config_8_memory_curve(quick):
    """Device-memory vs particle count for the flagship mega step — the
    reference's RSS-vs-N axis (timem_results.py:28-60, RSS plots in
    beluga_benchmark/docs/reports/).  XLA executable accounting
    (memory_analysis) per N; programs are compiled, not executed."""
    import functools

    import jax
    import numpy as np

    import bench as B
    from beluga_tpu.filters.amcl import AmclParams, update
    from beluga_tpu.filters.builders import make_windowed_scan_filter

    rows = []
    counts = (1 << 18,) if quick else (1 << 18, 1 << 20, 1 << 21, 1 << 22)
    for n in counts:
        built = B.build(1, n, 60, steps=4)
        _, ctx_b, state, odoms, pts, mks, _ = built
        models, ctx = make_windowed_scan_filter(
            ctx_b["grid"], k_bins=20, win=(32, 128),
            dth=2.0 * np.pi / 64.0, max_point_radius=3.6, tile=4096,
            tblk=20, recovery_candidates=256, coverage_threshold=0.0,
            exact_tail_frac=0.0, fused=True,
        )
        params = AmclParams(
            max_particles=n, min_particles=n, sorted_slots=True,
            resampling="systematic", recovery_pool=4096,
            selective_resampling=True,
        )
        take0 = lambda t: jax.tree_util.tree_map(lambda l: l[0], t)  # noqa: E731
        s = take0(state)
        step = jax.jit(functools.partial(update, params, models))
        sargs = (ctx, s, take0(odoms[0]), pts[0][0], mks[0][0])
        mem, detail = _mem_detail(step, *sargs)
        rows.append(_row(
            f"8-memory-{n}",
            f"flagship mega step at {n} particles (compile-time XLA "
            "accounting; particle state is "
            f"{n * 4 * 4 / 2**20:.0f} MB)",
            float("nan"), n, mem_mb=mem,
            extra=detail,
        ))
        del built, ctx_b, state, s
    return rows


CONFIGS = {
    "1": config_1_node_lf,
    "2": config_2_beam_kld,
    "3": config_3_resampling_sweep,
    "4": config_4_vdb,
    "5": config_5_fleet,
    "6": config_6_fleet_scale,
    "7": config_7_node_latency,
    "8": config_8_memory_curve,
}


# ---------------------------------------------------------------------------
# report rendering
# ---------------------------------------------------------------------------


def render_markdown(rows, meta, compare=None):
    old = {r["config"]: r for r in (compare or {}).get("rows", [])}
    lines = [
        "# Benchmark report",
        "",
        f"- date: {meta['date']}",
        f"- backend: {meta['backend']} ({meta['device']})",
        f"- jax: {meta['jax_version']}",
        f"- per-call dispatch floor: {meta.get('dispatch_floor_ms', 'n/a')} ms"
        " (INCLUDED in every ms/update row)",
        "",
        "Reference role: `beluga_benchmark` (config matrix + timem RSS "
        "capture + compare_results) — see SURVEY.md L10 and "
        "`beluga_benchmark/docs/reports/`.",
        "",
    ]
    hdr = ("| config | description | ms/update | particle-updates/s"
           " | device HBM (MB, XLA accounting) | host RSS (MB) |")
    sep = "|---|---|---|---|---|---|"
    if old:
        hdr += " vs prev |"
        sep += "---|"
    lines += [hdr, sep]
    for r in rows:
        mem_mb = r.get("device_mem_mb")
        if mem_mb is None:
            # allocator stats fallback (absent on the axon remote runtime)
            mem = r.get("device_mem") or {}
            peak = mem.get("peak_bytes_in_use")
            mem_s = f"{peak/2**20:.0f}" if peak else "n/a"
        else:
            mem_s = f"{mem_mb:.0f}"
        ups = r.get("particle_updates_per_s")
        ups_s = f"{ups:.3e}" if ups else "—"
        ms_s = r["ms_per_update"] if r.get("ms_per_update") is not None else "—"
        row = (f"| {r['config']} | {r['description']} | {ms_s} "
               f"| {ups_s} | {mem_s} "
               f"| {r['host_rss_mb']} |")
        if old:
            prev = old.get(r["config"])
            # memory-only rows (config 8) have null ms_per_update on
            # either side — show "new"/blank rather than dividing None
            if (prev and prev.get("ms_per_update") is not None
                    and r.get("ms_per_update") is not None):
                ratio = prev["ms_per_update"] / max(r["ms_per_update"], 1e-9)
                row += f" {ratio:.2f}x |"
            else:
                row += " new |"
        lines.append(row)
    lines += [
        "",
        "Notes:",
        "- ms/update excludes per-call dispatch only where stated; numbers",
        "  on remote backends are synchronous-mode (see NOTES.md).",
        "- Reference baseline (i9-9900, 16 threads) sustains ~1.4M",
        "  beam-evals/s/core at real-time replay (BASELINE.md); rows above",
        "  are one TPU chip.",
        "",
    ]
    # curated measurement sections (rooflines, regime studies) live in
    # REPORT_EXTRA.md so regenerating the config matrix preserves them
    import os as _os

    extra = _os.path.join(_os.path.dirname(__file__), "REPORT_EXTRA.md")
    if _os.path.exists(extra):
        with open(extra) as f:
            lines += [f.read()]
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/REPORT.md")
    ap.add_argument("--json", default="benchmarks/report.json")
    ap.add_argument("--configs", default="1,2,3,4,5,6,7,8")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--compare", default=None,
                    help="prior report.json to diff against")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    rows = []
    for c in args.configs.split(","):
        c = c.strip()
        try:
            out = CONFIGS[c](args.quick)
        except Exception as e:  # noqa: BLE001 - keep the matrix going
            print(f"config {c} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        rows.extend(out if isinstance(out, list) else [out])
        print(json.dumps(rows[-1]), flush=True)

    import jax.numpy as jnp

    floor_fn = jax.jit(lambda a: a + 1.0)
    floor = _timeit(floor_fn, jnp.ones(8), iters=8)
    meta = {
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "jax_version": jax.__version__,
        # per-call dispatch floor INCLUDED in every ms/update row (remote
        # tunnels add ~3-4 ms per dispatch; see NOTES.md r3 measurement
        # integrity)
        "dispatch_floor_ms": round(floor * 1e3, 3),
    }
    compare = None
    if args.compare and os.path.exists(args.compare):
        with open(args.compare) as f:
            compare = json.load(f)
    report = {"meta": meta, "rows": rows}
    with open(args.json, "w") as f:
        json.dump(report, f, indent=1)
    with open(args.out, "w") as f:
        f.write(render_markdown(rows, meta, compare))
    try:
        png = args.out.rsplit(".", 1)[0] + ".png"
        render_plot(rows, compare, png)
        print(f"wrote {png}")
    except Exception as e:  # noqa: BLE001 - plots are best-effort
        print(f"plot skipped: {type(e).__name__}: {e}", file=sys.stderr)
    print(f"wrote {args.out} and {args.json}")


def render_plot(rows, compare, path):
    """Log-scale throughput bar chart per config (the reference reports'
    PNG-plot role, beluga_benchmark/docs/reports/*/REPORT.md)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # memory-only rows (config 8) have no throughput — skip them
    rows = [r for r in rows if r.get("particle_updates_per_s") is not None]
    names = [r["config"] for r in rows]
    vals = [r["particle_updates_per_s"] for r in rows]
    old = {r["config"]: r["particle_updates_per_s"]
           for r in (compare or {}).get("rows", [])
           if r.get("particle_updates_per_s") is not None}
    fig, ax = plt.subplots(figsize=(9, 0.5 * len(rows) + 1.6))
    y = range(len(rows))
    ax.barh(y, vals, color="#3f7cac", label="this run")
    if old:
        prev = [old.get(n, 0) for n in names]
        ax.barh([i + 0.35 for i in y], prev, height=0.3, color="#b6c7d6",
                label="previous run")
        ax.legend(loc="lower right", frameon=False)
    ax.set_yticks(list(y), names)
    ax.set_xscale("log")
    ax.set_xlabel("particle-updates / s (log scale)")
    ax.invert_yaxis()
    for i, v in enumerate(vals):
        ax.text(v, i, f" {v:.2e}", va="center", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=120)


if __name__ == "__main__":
    main()
