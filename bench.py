"""Benchmark: full-AMCL particle-update throughput on one chip.

Measures the complete filter update (differential-drive propagate →
likelihood-field reweight over 60 beams → normalize → Thrun → resample →
KLD → estimate) on a fleet of independent filters, and reports
particle-updates/s/chip against the 1e9 north-star target (BASELINE.md).

Prints ONE JSON line:
  {"metric": "particle_updates_per_s_chip", "value": N, "unit": "1/s",
   "vs_baseline": N / 1e9, "mode": ...}

Measurement integrity: some remote-execution backends acknowledge work
before it runs, so ``block_until_ready`` can measure enqueue rate instead
of execution (see NOTES.md).  A device readback switches such sessions to
synchronous execution, but the switch itself takes an unpredictable 4-10
minutes.  The bench therefore runs ONE measurement child ("combined",
sync-first orchestration per VERDICT r2 #1) that

  1. probes for enqueue deception and prints the enqueue-side fallback
     JSON (flushed) — guaranteed early output;
  2. pays the readback switch with the whole remaining budget;
  3. measures and prints the honest synchronous primary (flushed) BEFORE
     any secondary;
  4. runs secondary configs while budget remains.

The orchestrator parses the LAST JSON line from the child's stdout — also
on timeout (``TimeoutExpired.stdout`` is kept, not discarded) — so a
timeout during the switch still reports the fallback and a timeout during
secondaries still reports the synchronous primary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

V5E_PEAK_F32_FLOPS = 2.5e14
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "570"))
_T0 = time.monotonic()

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
NPART = int(os.environ.get("BENCH_NPART", "4096"))
BEAMS = int(os.environ.get("BENCH_BEAMS", "60"))
LOOKUP_MODE = os.environ.get("BENCH_LOOKUP", "codebook16")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.monotonic() - _T0)


# ---------------------------------------------------------------------------
# measurement phases (run in subprocesses)
# ---------------------------------------------------------------------------


def _setup_jax():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        # the pre-registered TPU plugin overrides JAX_PLATFORMS at startup;
        # the config update after import is authoritative (NOTES.md)
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # rbg PRNG for the measurement child: 0.31 ms/step cheaper than
    # threefry at 2M (7.61 -> 7.30 ms/step, identical tracking accuracy —
    # NOTES r5 session 2).  RNG parity is statistical (SURVEY.md §7.3);
    # tests/test_winlut.py::test_fused_filter_tracks_with_rbg_keys covers
    # the rbg-keyed filter loop on CPU.
    jax.config.update("jax_default_prng_impl", "rbg")
    return jax


def _timeit(fn, *args, iters=8):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def build(batch: int, num_particles: int, num_beams: int, grid_size: int = 384,
          lookup_mode: str = "auto", steps: int = 192):
    """Tracking workload: a fleet of filters replaying a robot driving a
    circle through a synthetic map with geometry-consistent simulated
    scans and perfect odometry — the production regime of the reference's
    benchmark bag (converged cloud, real scan geometry).  Returns
    per-step lists for odometry/scan so the filters actually track.
    """
    import jax
    import jax.numpy as jnp

    from beluga_tpu.core.random import sample_normal_se2
    from beluga_tpu.filters.amcl import AmclParams, init_state
    from beluga_tpu.filters.builders import make_likelihood_field_filter
    from beluga_tpu.lie import SE2
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
    from beluga_tpu.parallel.fleet import make_fleet_update

    rng = np.random.default_rng(0)
    res = 0.05
    center = grid_size * res / 2
    data = np.zeros((grid_size, grid_size), np.int8)
    data[0, :] = data[-1, :] = OCCUPIED_VALUE
    data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    rr, cc = np.mgrid[0:grid_size, 0:grid_size]
    dist2 = ((rr + 0.5) * res - center) ** 2 + ((cc + 0.5) * res - center) ** 2
    # random clutter outside the arena
    for _ in range(24):
        r, c = rng.integers(10, grid_size - 20, 2)
        data[r : r + 8, c : c + 8] = OCCUPIED_VALUE
    # irregular obstacle ring at ~3.2 m so beams from the loop get returns;
    # jittered positions/sizes break rotational symmetry (a symmetric ring
    # makes the posterior multimodal in theta and the cloud never converges)
    for k in range(14):
        a = 2 * np.pi * k / 14 + rng.uniform(-0.15, 0.15)
        rad = 3.2 + rng.uniform(-0.35, 0.35)
        cx = int((center + rad * np.cos(a)) / res)
        cy = int((center + rad * np.sin(a)) / res)
        s = int(rng.integers(2, 7))
        data[max(cy - s, 0) : cy + s, max(cx - s, 0) : cx + s] = OCCUPIED_VALUE
    data[(dist2 < 2.6**2) & (rr > 0) & (rr < grid_size - 1)
         & (cc > 0) & (cc < grid_size - 1)] = 0  # free arena disk
    # distinct interior pillars (off the trajectory circle) give the scan a
    # unique orientation signature
    for px, py, s in ((0.45, 0.1, 4), (-0.55, 0.4, 2), (0.1, -0.6, 3)):
        cx = int((center + px) / res)
        cy = int((center + py) / res)
        data[cy - s : cy + s, cx - s : cx + s] = OCCUPIED_VALUE

    grid = make_grid(data, res)

    # ground-truth loop: tangent heading, 0.26 m / 0.22 rad per step (passes
    # the on-motion gate every update, like the reference bag cadence)
    r_traj, dth = 1.2, 0.22
    ts = np.arange(steps) * dth
    gx = center + r_traj * np.cos(ts)
    gy = center + r_traj * np.sin(ts)
    gyaw = ts + np.pi / 2

    # simulated scans: numpy DDA raycast against the same grid
    max_range = 3.5
    angles = np.linspace(-np.pi, np.pi, num_beams, endpoint=False)
    march = np.arange(1, int(max_range / (res * 0.5)) + 1) * (res * 0.5)
    pts_steps, mask_steps = [], []
    for t in range(steps):
        dirs = gyaw[t] + angles
        xs = gx[t] + march[None, :] * np.cos(dirs)[:, None]
        ys = gy[t] + march[None, :] * np.sin(dirs)[:, None]
        ci = np.floor(xs / res).astype(int)
        ri = np.floor(ys / res).astype(int)
        valid = (ci >= 0) & (ci < grid_size) & (ri >= 0) & (ri < grid_size)
        occ = np.zeros_like(valid)
        occ[valid] = data[ri[valid], ci[valid]] == OCCUPIED_VALUE
        first = np.argmax(occ, axis=1)
        hit = occ[np.arange(num_beams), first]
        d = np.where(hit, march[first], np.nan)
        pts = np.stack([d * np.cos(angles), d * np.sin(angles)], -1)
        pts_steps.append(
            jnp.asarray(
                np.broadcast_to(np.nan_to_num(pts), (batch, num_beams, 2)),
                jnp.float32,
            )
        )
        mask_steps.append(jnp.asarray(np.broadcast_to(hit, (batch, num_beams))))

    # theta-sorted slots let the codebook16 fast path window each sub-block
    # to a narrow theta band; sortedness is resample-invariant (amcl.py)
    sorted_slots = lookup_mode == "codebook16"
    params = AmclParams(
        max_particles=num_particles, min_particles=num_particles,
        sorted_slots=sorted_slots,
    )
    # pooled recovery generation (marginals exact; bootstrap joint among
    # injected particles — builders.py make_grid_random_state_fn)
    models, ctx = make_likelihood_field_filter(
        grid, lookup_mode=lookup_mode, recovery_candidates=256
    )

    @jax.jit
    def init(keys):
        def one(key):
            k1, k2 = jax.random.split(key)
            states = sample_normal_se2(
                k1, num_particles,
                SE2.from_xytheta(float(gx[0]), float(gy[0]), float(gyaw[0])),
                jnp.diag(jnp.asarray([0.25, 0.25, 0.068], jnp.float32)),
            )
            if sorted_slots:
                from beluga_tpu.core.particles import tree_take

                states = tree_take(states, jnp.argsort(states.theta))
            return init_state(k2, states, params)

        return jax.vmap(one)(keys)

    state = init(jax.random.split(jax.random.PRNGKey(1), batch))
    fleet_update = make_fleet_update(params, models)
    step = jax.jit(fleet_update, donate_argnums=(1,))
    odoms = [
        SE2.from_xytheta(
            jnp.full((batch,), gx[t]), jnp.full((batch,), gy[t]),
            jnp.full((batch,), gyaw[t]),
        )
        for t in range(steps)
    ]
    return step, ctx, state, odoms, pts_steps, mask_steps, fleet_update


class Runner:
    """Steps a built fleet through the recorded trajectory (cursor-based:
    every call consumes fresh odometry/scan steps so the filters keep
    tracking; the trajectory has enough steps for all phases)."""

    def __init__(self, built):
        (self.step, self.ctx, self.state, self.odoms, self.points,
         self.masks, self.raw_update) = built
        self.t = 0

    def run(self, iters, floor=0.0):
        import jax

        t0 = time.perf_counter()
        for _ in range(iters):
            self.state, _ = self.step(
                self.ctx, self.state, self.odoms[self.t],
                self.points[self.t], self.masks[self.t],
            )
            self.t += 1
        jax.block_until_ready(self.state)
        return max((time.perf_counter() - t0) / iters - floor, 1e-9)


class WinlutMega:
    """Scan-driven mega winlut filter (1 x n_mega x BEAMS, gate-free
    hybrid; the r5 flagship geometry — fused forward kernel, (32, 128)
    window, k_bins=tblk=20, tile=4096, K=192 steps/dispatch — each knob
    A/B-measured in-step, REPORT_EXTRA.md ladders) with a tracking
    accuracy gate.  Split into warm() and measure() so the (expensive,
    ~40-60 s) Mosaic compile can overlap the pending sync switch —
    VERDICT r3 #1: pay the readback switch concurrently with warmup."""

    def __init__(self, jax, n_mega=None, k_scan=192, reps=3):
        import jax.numpy as jnp

        from beluga_tpu.filters.amcl import AmclParams, update
        from beluga_tpu.filters.builders import make_windowed_scan_filter

        self.jax, self.jnp = jax, jnp
        if n_mega is None:
            # 2M beats 1M at the r4 config (1.59e8 vs 1.52e8 u/s: the
            # remaining fixed costs — DFT build, dispatch — amortize)
            n_mega = int(os.environ.get("BENCH_MEGA", "2097152"))
        self.n_mega, self.k_scan, self.reps = n_mega, k_scan, reps
        built = build(1, n_mega, BEAMS, steps=k_scan * (reps + 1) + 8)
        _, ctx_b, state, self.odoms, self.pts, self.mks, _ = built
        # r5-tuned mega config (each knob A/B-measured in-step at 1M,
        # NOTES.md r5; r4 knobs it keeps: bounded recovery pool, selective
        # resampling, no exact tail, static sort schedule):
        #   * fused=True: ONE Pallas pass does propagate + window coords +
        #     theta-slab lookup + weight log (ops/pallas_fused_step.py) —
        #     no [N]-sized intermediates between XLA fusions;
        #   * (32, 128) window + dth = 2pi/64 (wider lerp): 4x less
        #     lookup MXU work than r4's (64, 128) @ 2pi/128 at BETTER
        #     measured tracking accuracy (0.068/0.096 vs 0.100/0.206 err
        #     mean/max at 1M);
        #   * k_bins=20 (= tblk: the slab covers the whole LUT, 112 deg
        #     of relative theta range): 0.625x the LUT build cost of
        #     k_bins=32 — 7.14 -> 6.98 ms/step at 2M, err unchanged
        #     (session-2 D-ladder); k_bins=24 was the runner-up;
        #   * tblk=20 + 8-sub-step sort schedule: the coarser bins halve
        #     the per-step theta diffusion in bin units, so half the sorts
        #     cover the same slab slack;
        #   * int8 window tables measured SLOWER (kept opt-in only).
        # r3 16.9 -> r4 6.9 -> r5 4.5 ms/step at 1M (2M amortizes better).
        models_w, self.ctx_w = make_windowed_scan_filter(
            ctx_b["grid"], k_bins=20, win=(32, 128),
            dth=2.0 * np.pi / 64.0, max_point_radius=3.6,
            # tile=4096: the r5 session-2 ladder (8.57 -> 7.61 ms/step at
            # 2M going 512 -> 4096; 8192 is flat) — big tiles amortize the
            # per-program fixed costs of the fused kernel's grid
            tile=int(os.environ.get("BENCH_TILE", "4096")),
            tblk=int(os.environ.get("BENCH_TBLK", "20")),
            recovery_candidates=256,
            coverage_threshold=0.0, exact_tail_frac=0.0, fused=True,
        )
        self.params = params = AmclParams(
            max_particles=n_mega, min_particles=n_mega, sorted_slots=True,
            resampling="systematic", recovery_pool=4096,
            selective_resampling=True,
        )
        self.models_w = models_w
        import functools

        step = functools.partial(update, params, models_w)
        tmap = jax.tree_util.tree_map
        self._t0f = t0f = lambda t: tmap(lambda l: l[0], t)  # noqa: E731
        self.state0 = t0f(state)
        # static sort schedule: sort on sub-step 0
        self.sub = sub = int(os.environ.get("BENCH_SORT_SUB", "8"))
        assert k_scan % sub == 0

        def scan_all(ctx, st, od, p, m):
            def body(s, inp):
                odi, pi, mi = inp
                ests = []
                for j in range(sub):
                    oj = tmap(lambda l, j=j: l[j], odi)
                    s = s._replace(force_update=jnp.asarray(True))
                    s, est = step(ctx, s, oj, pi[j], mi[j], sort_now=(j == 0))
                    ests.append(est)
                return s, tmap(lambda *es: jnp.stack(es), *ests)

            return jax.lax.scan(body, st, (od, p, m))

        self.jscan = jax.jit(scan_all)
        self.st = None

    def _stack(self, i0):
        jnp, tmap = self.jnp, self.jax.tree_util.tree_map
        od = tmap(lambda *ls: jnp.stack(ls),
                  *[self._t0f(self.odoms[i0 + i]) for i in range(self.k_scan)])
        pts = jnp.stack(
            [self.pts[i0 + i][0] for i in range(self.k_scan)])
        mks = jnp.stack(
            [self.mks[i0 + i][0] for i in range(self.k_scan)])
        sub = self.sub
        resh = lambda l: l.reshape((self.k_scan // sub, sub) + l.shape[1:])  # noqa: E731
        return tmap(resh, od), resh(pts), resh(mks)

    def warm(self):
        od, p, mm = self._stack(0)
        self.st, _ = self.jscan(self.ctx_w, self.state0, od, p, mm)
        self.jax.block_until_ready(self.st)
        log(f"winlut-mega scan compiled+warm at {time.monotonic() - _T0:.0f}s")

    def measure(self, floor):
        jax, n_mega, k_scan = self.jax, self.n_mega, self.k_scan
        if self.st is None:
            self.warm()
        best, ests, i0 = 1e9, None, 0
        for r in range(self.reps):
            i0 = k_scan * (r + 1)
            od, p, mm = self._stack(i0)
            jax.block_until_ready((od, p, mm))
            t0 = time.perf_counter()
            self.st, ests = self.jscan(self.ctx_w, self.st, od, p, mm)
            jax.block_until_ready(self.st)
            best = min(best, (time.perf_counter() - t0) / k_scan)

        # tracking-accuracy gate on the last measured block (perfect
        # odometry ground truth): a diverged filter must not post a
        # headline
        ex = np.asarray(jax.device_get(ests.pose.xy)).reshape(k_scan, 2)
        gx = np.asarray(
            [[float(self.odoms[i0 + i].x[0]), float(self.odoms[i0 + i].y[0])]
             for i in range(k_scan)])
        err = np.hypot(ex[:, 0] - gx[:, 0], ex[:, 1] - gx[:, 1])
        log(f"winlut mega 1x{n_mega}x{BEAMS} scan-driven: "
            f"{best*1e3:.2f} ms/step ({n_mega/best:.3e} u/s) "
            f"err mean={err.mean():.3f} max={err.max():.3f}")
        if err.max() > 0.35:
            log("accuracy gate FAILED; keeping the fleet primary")
            return None
        return {
            "value": n_mega / best, "mode": "synchronous",
            "measurement": "scan_driven",
            "config": f"winlut_mega_1x{n_mega}x{BEAMS}",
            "steps_per_dispatch": k_scan,
            "err_mean_m": round(float(err.mean()), 3),
            "err_max_m": round(float(err.max()), 3),
            "floor_ms": floor * 1e3,
        }

    def measure_sharded(self):
        """The SAME flagship configuration through the shard_map mega path
        (parallel/mega.py) on a 1-device mesh — certifies the fastest path
        is the one that shards (VERDICT r4 #1): collectives are no-ops at
        S=1 and must reproduce the dense throughput; the 8-shard layout of
        the identical program is dryrun-certified on the virtual CPU mesh
        (__graft_entry__.dryrun_multichip).  Returns (ms_per_step, err)
        or None on gate failure."""
        import functools  # noqa: F401

        jax, jnp = self.jax, self.jnp
        from jax.sharding import Mesh

        from beluga_tpu.parallel.mega import make_mega_update, shard_mega_state

        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("tp",))
        mupdate = make_mega_update(self.params, self.models_w, mesh)
        tmap = jax.tree_util.tree_map
        sub = self.sub

        def scan_all(ctx, st, od, p, m):
            def body(s, inp):
                odi, pi, mi = inp
                ests = []
                for j in range(sub):
                    oj = tmap(lambda l, j=j: l[j], odi)
                    s = s._replace(force_update=jnp.asarray(True))
                    s, est = mupdate(ctx, s, oj, pi[j], mi[j],
                                     sort_now=(j == 0))
                    ests.append(est.pose.xy)
                return s, jnp.stack(ests)

            return jax.lax.scan(body, st, (od, p, m))

        jscan = jax.jit(scan_all)
        st = shard_mega_state(mesh, self.state0)
        od, p, mm_ = self._stack(0)
        st, _ = jscan(self.ctx_w, st, od, p, mm_)  # compile + warm
        jax.block_until_ready(st)
        i0 = self.k_scan
        od, p, mm_ = self._stack(i0)
        jax.block_until_ready((od, p, mm_))
        t0 = time.perf_counter()
        st, exy = jscan(self.ctx_w, st, od, p, mm_)
        jax.block_until_ready(st)
        dt = (time.perf_counter() - t0) / self.k_scan
        ex = np.asarray(jax.device_get(exy)).reshape(self.k_scan, 2)
        gx = np.asarray(
            [[float(self.odoms[i0 + i].x[0]), float(self.odoms[i0 + i].y[0])]
             for i in range(self.k_scan)])
        err = np.hypot(ex[:, 0] - gx[:, 0], ex[:, 1] - gx[:, 1])
        log(f"sharded mesh(1) flagship: {dt*1e3:.2f} ms/step "
            f"({self.n_mega/dt:.3e} u/s) err mean={err.mean():.3f} "
            f"max={err.max():.3f}")
        if err.max() > 0.35:
            return None
        return dt, err


def phase_combined() -> None:
    """Enqueue-side fallback, then the synchronous primary, then secondaries.

    Prints a JSON line (flushed) after each stage so the orchestrator can
    recover the best-available number from stdout even if this child is
    killed by the budget timeout mid-stage.

    Sync-switch orchestration (VERDICT r3 #1): the readback that switches a
    deceiving session to synchronous execution takes an unpredictable
    4-10 min but is SESSION-level, so it is started on a background thread
    immediately after the deception probe and overlaps every build /
    compile / warmup below instead of following them (r2/r3 serialized
    warm -> switch and the switch never landed inside the budget)."""
    jax = _setup_jax()
    import threading

    import jax.numpy as jnp

    m = 4096
    a = jnp.asarray(np.random.default_rng(0).random((m, m)), jnp.float32)
    f = jax.jit(lambda a: (a @ a).sum())
    dt = _timeit(f, a, iters=10)
    # biased toward "deceived": an honest sync session measured ~1.8e14 on
    # this chip, and a wrong "deceived" verdict only costs a no-op readback
    # while a wrong "honest" verdict mislabels enqueue rate as the primary
    deceived = 2 * m**3 / dt > 0.25 * V5E_PEAK_F32_FLOPS
    log(f"probe: matmul {m} in {dt*1e3:.3f} ms (deceived={deceived})")

    switch = {"dt": None}

    def _pay_switch():
        t0 = time.perf_counter()
        jax.device_get(jnp.ones(2))
        switch["dt"] = time.perf_counter() - t0
        log(f"sync switch landed: {switch['dt']:.0f}s "
            f"(at {time.monotonic() - _T0:.0f}s)")

    switch_thread = None
    if deceived:
        log("starting sync switch in background (overlaps builds/warmup)")
        switch_thread = threading.Thread(target=_pay_switch, daemon=True)
        switch_thread.start()

    runner = Runner(build(BATCH, NPART, BEAMS, lookup_mode=LOOKUP_MODE))
    runner.run(2)  # warm / compile
    per_step = runner.run(iters=8)
    ups = BATCH * NPART / per_step
    log(f"enqueue-side: {ups:.3e} updates/s ({per_step*1e3:.2f} ms/step)")

    if deceived and switch["dt"] is None:
        # Marginal-rate estimate: the difference between a long and a short
        # run isolates the steady-state (queue-saturated) per-step time.
        t_short = runner.run(iters=8) * 8
        t_long = runner.run(iters=72) * 72
        marginal = max((t_long - t_short) / 64, 1e-9)
        marginal_ups = BATCH * NPART / marginal
        log(f"enqueue marginal: {marginal_ups:.3e} updates/s "
            f"({marginal*1e3:.2f} ms/step)")
        if marginal_ups < 0.5 * ups:
            fallback, fmode = marginal_ups, "async_marginal"
        else:
            fallback, fmode = ups, "async_enqueue_upper_bound"
    else:
        fallback, fmode = ups, "async" if deceived else "synchronous"
    print(json.dumps({"value": fallback, "mode": fmode}), flush=True)

    # build + compile + warm the mega primary WHILE the switch is pending
    mega = None
    if os.environ.get("BENCH_SKIP_MEGA") != "1" and remaining() > 60:
        try:
            mega = WinlutMega(jax)
            mega.warm()
        except Exception as e:  # noqa: BLE001
            mega = None
            log(f"winlut-mega build skipped: {type(e).__name__}: {e}")

    floor_fn = jax.jit(lambda a: a + 1.0)
    _ = floor_fn(jnp.ones(8))
    jax.block_until_ready(runner.state)

    if switch_thread is not None:
        log(f"warm at {time.monotonic() - _T0:.0f}s; joining sync switch")
        # leave ~30 s: enough for floor + fleet + mega sync measurements
        switch_thread.join(timeout=max(remaining() - 30, 5))
        if switch["dt"] is None:
            log(f"sync switch STILL pending at {time.monotonic() - _T0:.0f}s"
                " — keeping the enqueue fallback")
            return
    floor = _timeit(floor_fn, jnp.ones(8), iters=10)
    log(f"roundtrip floor: {floor*1e3:.3f} ms")

    runner.run(4)  # settle into the converged tracking regime
    per_step = runner.run(iters=12, floor=floor)
    # Sync mode can be LOST silently (a remote-compile error resets the
    # session, observed in r3); re-probe and re-switch once if needed.
    dt2 = _timeit(f, a, iters=4)
    if deceived and 2 * m**3 / dt2 > 0.25 * V5E_PEAK_F32_FLOPS:
        log("session dropped sync mode mid-measure; re-switching")
        t0 = time.perf_counter()
        jax.device_get(jnp.ones(2))
        log(f"re-switch: {time.perf_counter() - t0:.0f}s")
        floor = _timeit(floor_fn, jnp.ones(8), iters=10)
        per_step = runner.run(iters=12, floor=floor)
    ups = BATCH * NPART / per_step
    log(f"sync interim (per-call fleet): {ups:.3e} updates/s "
        f"({per_step*1e3:.2f} ms/step)")
    print(json.dumps({"value": ups, "mode": "synchronous",
                      "measurement": "per_call_floor_subtracted",
                      "config": f"fleet_{BATCH}x{NPART}x{BEAMS}_{LOOKUP_MODE}",
                      "floor_ms": floor * 1e3}), flush=True)

    # Primary upgrade: the mega windowed-scan-LUT filter, measured
    # scan-driven (K steps per lax.scan dispatch — dispatch-amortized,
    # floor-free, enqueue-proof) with a tracking-accuracy gate so a
    # diverged filter can never post a throughput number.  Already
    # compiled+warm (overlapped with the switch), so this is seconds.
    mega_row = None
    if mega is not None and remaining() > 20:
        try:
            mega_row = mega.measure(floor)
            if mega_row is not None and mega_row["value"] > ups:
                print(json.dumps(mega_row), flush=True)
        except Exception as e:  # noqa: BLE001
            log(f"winlut-mega primary upgrade skipped: {type(e).__name__}: {e}")

    # certification: the SAME flagship configuration through the shard_map
    # mega path on a 1-device mesh (VERDICT r4 #1 — the fastest path must
    # be the one that shards).  Re-prints the primary row with the sharded
    # fields attached (same value; the driver takes the last JSON line).
    if mega is not None and mega_row is not None and remaining() > 150:
        try:
            sh = mega.measure_sharded()
            if sh is not None and mega_row["value"] > ups:
                dt, err = sh
                mega_row = {
                    **mega_row,
                    "sharded_mesh1_ms_per_step": round(dt * 1e3, 3),
                    "sharded_mesh1_err_max_m": round(float(err.max()), 3),
                }
                print(json.dumps(mega_row), flush=True)
        except Exception as e:  # noqa: BLE001
            log(f"sharded mesh(1) certification skipped: "
                f"{type(e).__name__}: {e}")

    # secondary (stderr only): dispatch-amortized sustained rate — the rest
    # of the trajectory as ONE lax.scan dispatch (the production replay
    # regime of tools/localize.py --scan-driven); enqueue-deception-proof
    # by construction: K steps per dispatch, one block at the end
    if remaining() > 120:
        try:
            k_scan = min(48, len(runner.odoms) - runner.t - 1)
            tmap = jax.tree_util.tree_map
            od_stack = tmap(
                lambda *ls: jnp.stack(ls),
                *[runner.odoms[runner.t + i] for i in range(k_scan)])
            pt_stack = jnp.stack(
                [runner.points[runner.t + i] for i in range(k_scan)])
            mk_stack = jnp.stack(
                [runner.masks[runner.t + i] for i in range(k_scan)])

            def scan_all(ctx, st, ods, pts, mks):
                def body(s, inp):
                    od, p, m = inp
                    s, est = runner.raw_update(ctx, s, od, p, m)
                    return s, est.valid

                return jax.lax.scan(body, st, (ods, pts, mks))

            jscan = jax.jit(scan_all)
            st2, _ = jscan(runner.ctx, runner.state, od_stack, pt_stack,
                           mk_stack)  # compile + warm
            jax.block_until_ready(st2)
            t0 = time.perf_counter()
            st2, _ = jscan(runner.ctx, runner.state, od_stack, pt_stack,
                           mk_stack)
            jax.block_until_ready(st2)
            d = (time.perf_counter() - t0) / k_scan
            log(json.dumps({
                "mode": "scan_driven", "value": BATCH * NPART / d,
                "ms_per_step": round(d * 1e3, 3), "steps_per_dispatch": k_scan,
            }))
            log(f"scan-driven fleet {BATCH}x{NPART}x{BEAMS} ({k_scan} steps/"
                f"dispatch): {d*1e3:.2f} ms/step "
                f"({BATCH * NPART / d:.3e} particle-updates/s sustained)")
        except Exception as e:  # noqa: BLE001
            log(f"scan-driven secondary skipped: {type(e).__name__}: {e}")

    # secondary (stderr only): the beam model through the CDDT range LUT at
    # the nav2-parity single-filter config (2000 particles x 60 beams);
    # per-update latency is the real-time-capability number
    if remaining() > 150:
        try:
            import jax.numpy as jnp

            from beluga_tpu.filters.amcl import AmclParams, update
            from beluga_tpu.filters.builders import make_beam_filter
            from beluga_tpu.models.sensor.beam import BeamModelParams

            _stepb, ctxb, stateb, odomsb, pointsb, masksb, _rawb = build(
                1, 2048, BEAMS, grid_size=192
            )
            grid = ctxb["grid"]
            bp = BeamModelParams(beam_max_range=9.0)
            t0 = time.monotonic()
            models_b, ctx_b = make_beam_filter(grid, beam_params=bp, use_range_lut=True)
            jax.block_until_ready(ctx_b["range_lut"])
            log(f"beam range-LUT build: {time.monotonic() - t0:.1f}s (one-off per map)")
            params_b = AmclParams(max_particles=2048, min_particles=512)
            st = jax.tree_util.tree_map(lambda l: l[0], stateb)
            bstep = jax.jit(
                lambda c, s, o, p, m: update(params_b, models_b, c, s, o, p, m)
            )
            o0 = jax.tree_util.tree_map(lambda l: l[0], odomsb[0])
            s = st
            for i in range(2):
                s = s._replace(force_update=jnp.asarray(True))
                s, _ = bstep(ctx_b, s, o0, pointsb[0][0], masksb[0][0])
            jax.block_until_ready(s)
            t0 = time.perf_counter()
            for _ in range(8):
                s = s._replace(force_update=jnp.asarray(True))
                s, _ = bstep(ctx_b, s, o0, pointsb[0][0], masksb[0][0])
            jax.block_until_ready(s)
            d = max((time.perf_counter() - t0) / 8 - floor, 1e-9)
            log(
                f"beam LUT nav2 config (2048x60): {d*1e3:.2f} ms/update "
                f"({2048 * BEAMS / d:.3e} beam-evals/s)"
            )
        except Exception as e:  # noqa: BLE001
            log(f"beam secondary skipped: {type(e).__name__}: {e}")

    # secondary (stderr only): the windowed beam range-LUT kernel at fleet
    # scale (ops/pallas_beam_lut.py) — the beam-model tracking fast path
    if remaining() > 150:
        try:
            import jax.numpy as jnp

            from beluga_tpu.filters.amcl import AmclParams
            from beluga_tpu.filters.builders import make_beam_filter
            from beluga_tpu.models.sensor.beam import BeamModelParams
            from beluga_tpu.parallel.fleet import make_fleet_update

            _sw, ctx_w, st_w, od_w, pts_w, mk_w, _raww = build(
                BATCH, NPART, BEAMS, lookup_mode=LOOKUP_MODE
            )
            bp_w = BeamModelParams(beam_max_range=4.0)
            t0 = time.monotonic()
            models_w, ctx_w2 = make_beam_filter(
                ctx_w["grid"], beam_params=bp_w, use_range_lut="windowed",
                n_bearings=128,
            )
            jax.block_until_ready(ctx_w2["range_lut_bf16"])
            log(f"windowed beam LUT build: {time.monotonic() - t0:.1f}s "
                "(one-off per map)")
            p_w = AmclParams(max_particles=NPART, min_particles=NPART,
                             sorted_slots=True)
            wstep = jax.jit(make_fleet_update(p_w, models_w))
            sw = st_w
            for i in range(4):
                sw, _ = wstep(ctx_w2, sw, od_w[i], pts_w[i], mk_w[i])
            jax.block_until_ready(sw)
            t0 = time.perf_counter()
            for i in range(8):
                sw, _ = wstep(ctx_w2, sw, od_w[4 + i], pts_w[4 + i], mk_w[4 + i])
            jax.block_until_ready(sw)
            d = max((time.perf_counter() - t0) / 8 - floor, 1e-9)
            log(
                f"windowed beam fleet {BATCH}x{NPART}x{BEAMS}: "
                f"{d*1e3:.2f} ms/step ({BATCH * NPART / d:.3e} "
                f"particle-updates/s, {BATCH * NPART * BEAMS / d:.3e} "
                "beam-evals/s)"
            )
        except Exception as e:  # noqa: BLE001
            log(f"windowed beam secondary skipped: {type(e).__name__}: {e}")

    # secondary (stderr only): BASELINE config #4 — 3D VDB-style
    # localization, 131072 SE3 particles x 80 points, codebook fast path
    if remaining() > 120:
        try:
            import jax.numpy as jnp

            from beluga_tpu.core.random import sample_normal_se3
            from beluga_tpu.filters.amcl import AmclParams, init_state, update
            from beluga_tpu.filters.vdb_builders import make_vdb_filter_3d
            from beluga_tpu.lie import SE3, SO3
            from beluga_tpu.maps.voxel import make_distance_grid_from_points

            rng_v = np.random.default_rng(4)
            wpts = [[x, y, 0.0] for x in np.arange(0, 8, 0.2)
                    for y in np.arange(0, 8, 0.2)]
            for t in np.arange(0, 8, 0.1):
                for zz in np.arange(0, 2.5, 0.25):
                    wpts += [[t, 0.0, zz], [0.0, t, zz]]
            wpts += [[5.0, 5.0, zz] for zz in np.arange(0, 2.0, 0.2)]
            grid_v = make_distance_grid_from_points(wpts, 0.2, max_distance=5.0)
            models_v, ctx_v = make_vdb_filter_3d(grid_v, voxel_size_hint=0.2)
            n_v = 131072
            p_v = AmclParams(max_particles=n_v, min_particles=n_v // 4)
            meas = np.asarray(
                [[5.0, 5.0, zz] for zz in np.arange(0, 2.0, 0.2)]
                + [[t, 0.0, 1.0] for t in np.arange(0, 8, 0.4)]
                + [[0.0, t, 1.0] for t in np.arange(0, 8, 0.4)])
            sel = meas[rng_v.integers(0, len(meas), 80)]
            cy, sy = np.cos(0.3), np.sin(0.3)
            rot = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
            pts_v = jnp.asarray(
                ((sel - np.array([3.0, 3.0, 0.0])) @ rot
                 + rng_v.normal(0, 0.02, sel.shape)).astype(np.float32))
            mask_v = jnp.ones(len(pts_v), bool)
            kv1, kv2 = jax.random.split(jax.random.PRNGKey(0))
            mean_v = SE3(jnp.asarray([3.0, 3.0, 0.0], jnp.float32),
                         SO3.from_rpy(jnp.float32(0.0), jnp.float32(0.0),
                                      jnp.float32(0.3)))
            sv = init_state(
                kv2, sample_normal_se3(kv1, n_v, mean_v, jnp.eye(6) * 0.05),
                p_v, odom_identity=SE3.identity())
            vstep = jax.jit(lambda s, p, m: update(
                p_v, models_v, ctx_v,
                s._replace(force_update=jnp.asarray(True)),
                SE3.identity(), p, m))
            for _ in range(3):
                sv, _ = vstep(sv, pts_v, mask_v)
            jax.block_until_ready(sv)
            t0 = time.perf_counter()
            for _ in range(8):
                sv, _ = vstep(sv, pts_v, mask_v)
            jax.block_until_ready(sv)
            d = max((time.perf_counter() - t0) / 8 - floor, 1e-9)
            log(f"VDB 3D config#4 1x{n_v}x80pts: {d*1e3:.2f} ms/update "
                f"({n_v / d:.3e} particle-updates/s)")
        except Exception as e:  # noqa: BLE001
            log(f"VDB secondary skipped: {type(e).__name__}: {e}")

    # secondary (stderr only): NDT fleet (dense small-map evaluation) on
    # the reference turtlebot3_world NDT map
    if remaining() > 90:
        try:
            import jax.numpy as jnp

            from beluga_tpu.core.random import sample_normal_se2
            from beluga_tpu.filters.amcl import AmclParams, init_state
            from beluga_tpu.filters.ndt_builders import make_ndt_filter_2d
            from beluga_tpu.lie import SE2
            from beluga_tpu.maps.ndt import load_ndt_hdf5
            from beluga_tpu.parallel.fleet import make_fleet_update

            nm = load_ndt_hdf5("/root/reference/beluga/test/beluga/"
                               "test_data/turtlebot3_world.hdf5")
            models_n, ctx_n = make_ndt_filter_2d(nm)
            p_n = AmclParams(max_particles=NPART, min_particles=NPART)
            rng_n = np.random.default_rng(0)
            true_n = (-1.7, 0.5, 0.2)
            mu = np.asarray(nm.means)
            near = np.isfinite(mu).all(1) & (
                np.linalg.norm(mu - np.asarray(true_n[:2]), axis=1) < 3.0)
            sel = mu[near][rng_n.integers(0, near.sum(), BEAMS)]
            cyn, syn = np.cos(true_n[2]), np.sin(true_n[2])
            loc = (sel - np.asarray(true_n[:2])) @ np.array(
                [[cyn, -syn], [syn, cyn]])
            pts_n = jnp.asarray(np.broadcast_to(
                (loc + rng_n.normal(0, 0.01, loc.shape)).astype(np.float32),
                (BATCH, BEAMS, 2)))
            mask_n = jnp.ones((BATCH, BEAMS), bool)
            keys_n = jax.random.split(jax.random.PRNGKey(0), BATCH)

            def one_n(key):
                k1, k2 = jax.random.split(key)
                st = sample_normal_se2(
                    k1, NPART, SE2.from_xytheta(*true_n),
                    jnp.diag(jnp.asarray([0.05, 0.05, 0.02], jnp.float32)))
                return init_state(k2, st, p_n)

            sn = jax.vmap(one_n)(keys_n)
            od_n = SE2.from_xytheta(
                jnp.full((BATCH,), true_n[0]), jnp.full((BATCH,), true_n[1]),
                jnp.full((BATCH,), true_n[2]))
            nstep = jax.jit(make_fleet_update(p_n, models_n))
            for _ in range(3):
                sn = sn._replace(force_update=jnp.ones(BATCH, bool))
                sn, _ = nstep(ctx_n, sn, od_n, pts_n, mask_n)
            jax.block_until_ready(sn)
            t0 = time.perf_counter()
            for _ in range(8):
                sn = sn._replace(force_update=jnp.ones(BATCH, bool))
                sn, _ = nstep(ctx_n, sn, od_n, pts_n, mask_n)
            jax.block_until_ready(sn)
            d = max((time.perf_counter() - t0) / 8 - floor, 1e-9)
            log(f"NDT fleet {BATCH}x{NPART}x{BEAMS}: {d*1e3:.2f} ms/step "
                f"({BATCH * NPART / d:.3e} particle-updates/s)")
        except Exception as e:  # noqa: BLE001
            log(f"NDT secondary skipped: {type(e).__name__}: {e}")

    # secondary (stderr only): the mega-particle configuration — one filter
    # with 262144 particles, globally stratified systematic resampling
    if remaining() > 120:
        try:
            import jax.numpy as jnp

            from beluga_tpu.filters.amcl import AmclParams, update
            from beluga_tpu.filters.builders import make_likelihood_field_filter

            n_mega = 262144
            _sm, ctx_m, st_m, od_m, pts_m, mk_m, _rawm = build(1, n_mega, BEAMS)
            models_m, ctx_m = make_likelihood_field_filter(
                ctx_m["grid"], recovery_candidates=256
            )
            p_m = AmclParams(max_particles=n_mega, min_particles=n_mega // 4,
                             resampling="systematic")
            sm = jax.tree_util.tree_map(lambda l: l[0], st_m)
            om = jax.tree_util.tree_map(lambda l: l[0], od_m[0])
            mstep = jax.jit(lambda c, s, o, p, m: update(p_m, models_m, c, s, o, p, m))
            for i in range(2):
                sm = sm._replace(force_update=jnp.asarray(True))
                sm, _ = mstep(ctx_m, sm, om, pts_m[0][0], mk_m[0][0])
            jax.block_until_ready(sm)
            t0 = time.perf_counter()
            for _ in range(6):
                sm = sm._replace(force_update=jnp.asarray(True))
                sm, _ = mstep(ctx_m, sm, om, pts_m[0][0], mk_m[0][0])
            jax.block_until_ready(sm)
            d = max((time.perf_counter() - t0) / 6 - floor, 1e-9)
            log(f"mega filter 1x{n_mega}: {d*1e3:.2f} ms/update "
                f"({n_mega / d:.3e} particle-updates/s)")
        except Exception as e:  # noqa: BLE001
            log(f"mega secondary skipped: {type(e).__name__}: {e}")

    # secondary (stderr only): windowed-scan-LUT mega filter — the per-scan
    # pose-likelihood window around the converged cloud (DFT build ~3 ms)
    # replaces the per-beam reweight with ONE MXU lookup per particle;
    # coverage-gated exact fallback (filters/builders.py)
    if remaining() > 120:
        try:
            import jax.numpy as jnp

            from beluga_tpu.filters.amcl import AmclParams, update
            from beluga_tpu.filters.builders import make_windowed_scan_filter

            n_mega = 262144
            _sw2, ctx_wm, st_wm, od_wm, pts_wm, mk_wm, _rawwm = build(1, n_mega, BEAMS)
            models_wm, ctx_wm = make_windowed_scan_filter(
                ctx_wm["grid"], k_bins=64, win=128, max_point_radius=3.6,
                recovery_candidates=256,
            )
            p_wm = AmclParams(max_particles=n_mega, min_particles=n_mega,
                              resampling="systematic", sorted_slots=True)
            swm = jax.tree_util.tree_map(lambda l: l[0], st_wm)
            wmstep = jax.jit(
                lambda c, s, o, p, m: update(p_wm, models_wm, c, s, o, p, m)
            )
            for i in range(3):
                swm = swm._replace(force_update=jnp.asarray(True))
                swm, _ = wmstep(
                    ctx_wm, swm, jax.tree_util.tree_map(lambda l: l[0], od_wm[i]),
                    pts_wm[i][0], mk_wm[i][0])
            jax.block_until_ready(swm)
            t0 = time.perf_counter()
            for i in range(6):
                swm = swm._replace(force_update=jnp.asarray(True))
                swm, _ = wmstep(
                    ctx_wm, swm,
                    jax.tree_util.tree_map(lambda l: l[0], od_wm[3 + i]),
                    pts_wm[3 + i][0], mk_wm[3 + i][0])
            jax.block_until_ready(swm)
            d = max((time.perf_counter() - t0) / 6 - floor, 1e-9)
            log(f"winlut mega 1x{n_mega} (incl. per-scan window build): "
                f"{d*1e3:.2f} ms/update ({n_mega / d:.3e} particle-updates/s)")
        except Exception as e:  # noqa: BLE001
            log(f"winlut mega secondary skipped: {type(e).__name__}: {e}")

    # secondary (stderr only): shared-scan mega filter — the per-scan
    # correlation LUT (Pallas VMEM build) replaces the per-beam reweight;
    # beats the exact path as beam count grows (1.55x at 180 beams)
    if remaining() > 120:
        try:
            import jax.numpy as jnp

            from beluga_tpu.filters.amcl import AmclParams, update
            from beluga_tpu.filters.builders import make_shared_scan_filter

            n_mega = 262144
            _sm, ctx_s, st_s, od_s, pts_s, mk_s, _raws = build(1, n_mega, BEAMS)
            models_s, ctx_s, prepare_s = make_shared_scan_filter(
                ctx_s["grid"], n_theta=128, max_point_radius=4.0,
                lut_build="pallas",
                lut_build_kwargs=dict(sampling="nearest", downsample=2),
            )
            p_s = AmclParams(max_particles=n_mega, min_particles=n_mega // 4,
                             resampling="systematic")
            sm = jax.tree_util.tree_map(lambda l: l[0], st_s)
            om = jax.tree_util.tree_map(lambda l: l[0], od_s[0])

            def sstep(c, s, o, p, m):
                c2 = prepare_s(c, p, m)  # LUT build folded into the step
                s = s._replace(force_update=jnp.asarray(True))
                return update(p_s, models_s, c2, s, o, p, m)

            jstep = jax.jit(sstep)
            for _ in range(2):
                sm, _ = jstep(ctx_s, sm, om, pts_s[0][0], mk_s[0][0])
            jax.block_until_ready(sm)
            t0 = time.perf_counter()
            for _ in range(6):
                sm, _ = jstep(ctx_s, sm, om, pts_s[0][0], mk_s[0][0])
            jax.block_until_ready(sm)
            d = max((time.perf_counter() - t0) / 6 - floor, 1e-9)
            log(f"shared-scan mega 1x{n_mega} (incl. per-scan LUT build): "
                f"{d*1e3:.2f} ms/update ({n_mega / d:.3e} particle-updates/s)")
        except Exception as e:  # noqa: BLE001
            log(f"shared-scan secondary skipped: {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


def _decode(b):
    if b is None:
        return ""
    return b.decode(errors="replace") if isinstance(b, bytes) else b


def _last_json(text: str):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _run_phase(phase: str, timeout: float):
    env = {**os.environ, "BENCH_BUDGET_S": str(int(timeout))}
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=env,
        )
        stdout, stderr, note = proc.stdout, proc.stderr, f"rc={proc.returncode}"
    except subprocess.TimeoutExpired as e:
        # the child may have printed (flushed) results before the kill —
        # keep them (VERDICT r2: a timed-out secondary must not discard the
        # already-printed primary)
        stdout, stderr = _decode(e.stdout), _decode(e.stderr)
        note = f"timed out after {timeout:.0f}s"
        log(f"phase {phase} {note}")
    for line in (stderr or "").splitlines():
        if "WARNING" not in line:
            log(f"[{phase}] {line}")
    result = _last_json(stdout or "")
    if result is None:
        log(f"phase {phase} produced no result ({note})")
    return result


def main():
    # Sync-first (VERDICT r2 #1): the combined child gets the whole budget;
    # it prints the enqueue-side fallback early and the synchronous primary
    # as soon as the readback switch lands, so whatever the timeout
    # interrupts, the best-available number survives on stdout.
    r = _run_phase("combined", timeout=max(remaining() - 12, 60))
    value, mode, extra = 0.0, "failed", {}
    if r is not None:
        value, mode = r.get("value", 0.0), r.get("mode", "synchronous")
        for k in ("measurement", "config", "steps_per_dispatch",
                  "err_mean_m", "err_max_m"):
            if k in r:
                extra[k] = r[k]
        if "floor_ms" in r:
            extra["floor_ms"] = round(r["floor_ms"], 3)

    print(
        json.dumps(
            {
                "metric": "particle_updates_per_s_chip",
                "value": value,
                "unit": "1/s",
                "vs_baseline": value / 1e9,
                "mode": mode,
                "lookup": LOOKUP_MODE,
                "workload": "tracking",
                **extra,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--phase":
        {"combined": phase_combined}[sys.argv[2]]()
    else:
        main()
