"""Convenience constructors wiring models into the AMCL filter.

The analog of ``beluga_ros::Amcl``'s model-variant construction
(beluga_ros/src/amcl.cpp:28-46, beluga_amcl/src/amcl_node.cpp:350-433):
pick a motion model and a sensor model by name, build the map context, and
return the ``AmclModels`` function table plus the ``ctx`` pytree consumed by
``beluga_tpu.filters.amcl.update``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from beluga_tpu.core.random import sample_uniform_free_cells
from beluga_tpu.filters.amcl import AmclModels, default_estimate, default_hash_state
from beluga_tpu.maps.occupancy import OccupancyGrid
from beluga_tpu.models.motion.differential_drive import (
    DifferentialDriveParams,
    diff_drive_propagate,
)
from beluga_tpu.models.motion.omnidirectional import (
    OmnidirectionalDriveParams,
    omni_drive_propagate,
)
from beluga_tpu.models.motion.stationary import stationary_propagate
from beluga_tpu.models.sensor.likelihood_field import (
    LikelihoodFieldParams,
    likelihood_field_prob_weights,
    likelihood_field_weights,
    make_likelihood_field,
)

Array = jax.Array


def make_motion_fn(motion_params):
    """Map a motion-params dataclass to its propagate function."""
    if isinstance(motion_params, DifferentialDriveParams):
        def propagate(ctx, key, states, pose, prev):
            del ctx
            return diff_drive_propagate(motion_params, key, states, pose, prev)
    elif isinstance(motion_params, OmnidirectionalDriveParams):
        def propagate(ctx, key, states, pose, prev):
            del ctx
            return omni_drive_propagate(motion_params, key, states, pose, prev)
    elif motion_params == "stationary":
        def propagate(ctx, key, states, pose, prev):
            del ctx, pose, prev
            return stationary_propagate(key, states)
    else:
        raise ValueError(f"unknown motion model: {motion_params!r}")
    return propagate


def make_grid_random_state_fn(recovery_candidates: int = 0):
    """Recovery generator: uniform over the free cells of ctx['grid']
    (beluga_ros/amcl.hpp map_distribution_).

    ``recovery_candidates > 0`` switches to the pooled generator
    (core/random.py sample_uniform_free_cells_pooled): a fresh pool of
    candidate cells per call, slots assigned on the MXU — removes the
    serialized n-row gather (~2.7 ms per fleet resample, ~5 ms at mega
    scale) at the cost of bootstrap (not iid-distinct) joint statistics
    among injected particles; marginals stay exact.  The pool scales with
    the request size (``max(recovery_candidates, n // 8)``, capped at 4096
    — the pool-take kernel's scoped-VMEM budget caps the one-hot at
    ~16k x 512 lanes) so relocalization bursts that inject most of the
    filter draw from a candidate set proportional to the injection count
    rather than a fixed 256 cells; full global relocalization (the
    service path, node.py:134-148) uses the exact iid sampler."""

    def random_state(ctx, key, n, particles=None):
        del particles
        grid: OccupancyGrid = ctx["grid"]
        if recovery_candidates and recovery_candidates < n:
            from beluga_tpu.core.random import sample_uniform_free_cells_pooled

            return sample_uniform_free_cells_pooled(
                key, n, grid.free_xy, grid.num_free,
                pool=min(n, max(recovery_candidates, n // 8), 4096),
            )
        return sample_uniform_free_cells(key, n, grid.free_xy, grid.num_free)

    return random_state


def make_likelihood_field_filter(
    grid: OccupancyGrid,
    lf_params: LikelihoodFieldParams = LikelihoodFieldParams(),
    motion_params: Any = DifferentialDriveParams(),
    prob_model: bool = False,
    use_cluster_estimate: bool = False,
    lookup_mode: str = "auto",
    lowrank_rank: int = 48,
    recovery_candidates: int = 0,
):
    """Assemble the likelihood-field AMCL configuration.

    Returns ``(models, ctx)``.  ``ctx = {'grid', 'field'}`` — rebuilding the
    ctx with :func:`update_map_ctx` hot-swaps the map without recompiling.

    ``lookup_mode``: 'auto' | 'gather' | 'onehot' (exact), 'codebook'
    (exact-to-codebook 8-bit code table, the TPU default — zero error for
    production fields, ~2x the onehot rate), 'codebook16' ('codebook' plus
    the per-beam-window bf16 fast path: <=0.2% weight error on converged
    particle tiles, exact elsewhere, ~3x the codebook rate when tracking),
    or 'lowrank' (approximate SVD-factored fast path).
    """
    valid_modes = ("auto", "gather", "onehot", "codebook", "codebook16", "lowrank")
    if lookup_mode not in valid_modes:
        raise ValueError(f"unknown lookup_mode {lookup_mode!r}; expected one of {valid_modes}")
    if lookup_mode == "auto" and not prob_model and jax.default_backend() == "tpu":
        lookup_mode = "codebook"

    if prob_model:
        def log_weight(ctx, states, points, beam_mask):
            return likelihood_field_prob_weights(
                ctx["field"], states, points, beam_mask, lookup_mode="auto",
                codes_book=ctx.get("field_codes"),
                values3=ctx.get("field_values3"),
            )
    elif lookup_mode in ("codebook", "codebook16"):
        from beluga_tpu.models.sensor.likelihood_field import (
            likelihood_field_weights_codebook,
        )

        def log_weight(ctx, states, points, beam_mask):
            lik = likelihood_field_weights_codebook(
                ctx["field"], ctx["field_codes"], states, points, beam_mask,
                values3=ctx.get("field_values3"),
            )
            return jnp.log(lik)
    elif lookup_mode == "lowrank":
        from beluga_tpu.models.sensor.likelihood_field import (
            likelihood_field_weights_lowrank,
        )

        def log_weight(ctx, states, points, beam_mask):
            lik = likelihood_field_weights_lowrank(
                ctx["field"], ctx["field_factors"], states, points, beam_mask
            )
            return jnp.log(lik)
    else:
        def log_weight(ctx, states, points, beam_mask):
            lik = likelihood_field_weights(
                ctx["field"], states, points, beam_mask, lookup_mode=lookup_mode
            )
            return jnp.log(lik)

    if use_cluster_estimate:
        from beluga_tpu.algorithms.cluster import cluster_based_estimate

        def estimate(params, particles):
            return cluster_based_estimate(particles.state, particles.weight, particles.mask)
    else:
        estimate = default_estimate

    models = AmclModels(
        propagate=make_motion_fn(motion_params),
        log_weight=log_weight,
        random_state=make_grid_random_state_fn(recovery_candidates),
        hash_state=default_hash_state,
        estimate=estimate,
    )
    field = make_likelihood_field(lf_params, grid)
    ctx = {"grid": grid, "field": field}
    if prob_model and lookup_mode in ("auto", "codebook", "codebook16"):
        ctx["field_codes"] = _make_field_codes(field, lf_params, grid)
        if lookup_mode == "codebook16":
            from beluga_tpu.ops.pallas_reweight import build_values3

            ctx["field_values3"] = build_values3(
                *ctx["field_codes"], log_space=True
            )
            ctx["field_values3_log"] = True
    elif lookup_mode == "lowrank":
        from beluga_tpu.ops.gather2d import factorize_table

        ctx["field_factors"] = factorize_table(field.values, lowrank_rank)
    elif lookup_mode in ("codebook", "codebook16"):
        ctx["field_codes"] = _make_field_codes(field, lf_params, grid)
        if lookup_mode == "codebook16":
            from beluga_tpu.ops.pallas_reweight import build_values3

            ctx["field_values3"] = build_values3(*ctx["field_codes"])
    return models, ctx


def _make_field_codes(field, lf_params, grid: OccupancyGrid):
    """(codes i32[H, W], codebook f32[256]) for the code-table lookup.

    The codebook is the table's actual distinct values (device unique,
    bit-exact when <= 256 of them); the analytic host proposal
    (maps/codebook.py) only serves as the > 256 fallback."""
    from beluga_tpu.maps.codebook import likelihood_field_codebook
    from beluga_tpu.ops.gather2d import build_device_codebook, encode_table

    fallback = jnp.asarray(likelihood_field_codebook(lf_params, grid.resolution_hint))
    book = build_device_codebook(field.values, fallback)
    return encode_table(field.values, book), book


def update_map_ctx(ctx: dict, grid: OccupancyGrid, lf_params: LikelihoodFieldParams) -> dict:
    """Hot-swap the map (amcl_node.cpp:469-471): recompute the likelihood
    field, keep everything else."""
    new_ctx = {**ctx, "grid": grid, "field": make_likelihood_field(lf_params, grid)}
    if "field_codes" in ctx:
        new_ctx["field_codes"] = _make_field_codes(new_ctx["field"], lf_params, grid)
        if "field_values3" in ctx:
            from beluga_tpu.ops.pallas_reweight import build_values3

            new_ctx["field_values3"] = build_values3(
                *new_ctx["field_codes"],
                log_space=ctx.get("field_values3_log", False),
            )
    if "field_factors" in ctx:
        from beluga_tpu.ops.gather2d import factorize_table

        new_ctx["field_factors"] = factorize_table(
            new_ctx["field"].values, ctx["field_factors"][0].shape[1]
        )
    return new_ctx


def make_shared_scan_filter(
    grid: OccupancyGrid,
    lf_params: LikelihoodFieldParams = LikelihoodFieldParams(),
    motion_params: Any = DifferentialDriveParams(),
    n_theta: int = 128,
    max_point_radius: float = 4.0,
    lut_build: str | None = None,
    lut_build_kwargs: dict | None = None,
    recovery_candidates: int = 0,
):
    """Likelihood-field AMCL for fleets that score the *same* scan.

    The per-scan correlation LUT (models/sensor/likelihood_field_lut.py) is
    built once per scan with :func:`prepare_shared_scan_ctx` and shared by
    every filter/particle through the ctx; the reweight then costs two
    θ-interpolated lookups per particle instead of B beam lookups.

    ``lut_build`` selects the per-scan build backend: ``"pallas"`` (VMEM
    kernel, the TPU default), ``"roll"`` (XLA shifted accumulations — same
    numbers, portable; the default off-TPU where the Pallas kernel would
    run interpreted), or ``"fft"`` (spectral, cheap at large K but
    periodic-sinc sampled).  ``lut_build_kwargs`` are forwarded to the
    build function (e.g. ``sampling="nearest"``, ``downsample=2`` for the
    Pallas backend's speed/accuracy knobs).

    Returns ``(models, ctx, prepare)`` where
    ``prepare(ctx, points, beam_mask) -> ctx`` refreshes the LUT (jit it
    with the fleet step or call it per scan).
    """
    from beluga_tpu.models.sensor.likelihood_field_lut import (
        build_scan_lut,
        build_scan_lut_fft,
        build_scan_lut_pallas,
        scan_lut_weights,
    )

    builders = {
        "roll": build_scan_lut,
        "pallas": build_scan_lut_pallas,
        "fft": build_scan_lut_fft,
    }
    if lut_build is None:
        lut_build = "pallas" if jax.default_backend() == "tpu" else "roll"
    if lut_build not in builders:
        raise ValueError(f"unknown lut_build: {lut_build!r}")
    build_fn = builders[lut_build]

    def log_weight(ctx, states, points, beam_mask):
        del points, beam_mask  # folded into the shared LUT
        return jnp.log(scan_lut_weights(ctx["scan_lut"], states))

    models = AmclModels(
        propagate=make_motion_fn(motion_params),
        log_weight=log_weight,
        random_state=make_grid_random_state_fn(recovery_candidates),
        hash_state=default_hash_state,
        estimate=default_estimate,
    )
    field = make_likelihood_field(lf_params, grid)
    res_hint = grid.resolution_hint

    extra = dict(lut_build_kwargs or {})

    def prepare(ctx, points, beam_mask):
        lut = build_fn(
            ctx["field"], points, beam_mask, n_theta=n_theta,
            max_point_radius=max_point_radius, resolution_hint=res_hint,
            **extra,
        )
        return {**ctx, "scan_lut": lut}

    ctx = {"grid": grid, "field": field}
    return models, ctx, prepare


def _exact_tail_slots(n: int, tile: int, frac: float) -> int:
    """Suffix length (tile-aligned) scored by the exact model in the
    hybrid winlut reweight; 0 disables the hybrid."""
    if frac <= 0.0 or n < 2 * tile:
        return 0
    s = max(tile, int(round(n * frac / tile)) * tile)
    return min(s, n - tile)


def make_windowed_scan_filter(
    grid: OccupancyGrid,
    lf_params: LikelihoodFieldParams = LikelihoodFieldParams(),
    motion_params: Any = DifferentialDriveParams(),
    k_bins: int = 64,
    win: int = 128,
    dth: float = 2.0 * 3.141592653589793 / 128.0,
    max_point_radius: float = 4.0,
    tile: int = 512,
    tblk: int = 16,
    coverage_threshold: float = 0.98,
    recovery_candidates: int = 0,
    exact_tail_frac: float = 0.125,
    table_dtype: str = "bf16",
    fused: bool = False,
):
    """Likelihood-field AMCL through the *windowed* per-scan pose LUT —
    the single-(mega-)filter tracking fast path.

    ``table_dtype="int8"`` quantizes the window table — measured a
    REGRESSION on v5e (the per-slab one-hot quantization and int32
    accumulate cost more than the 2x MXU rate buys: 8.78 vs 7.42 ms/step
    at 1M, NOTES.md r5); kept for smaller-VMEM use cases only.

    ``fused=True`` replaces the separate propagate + reweight with ONE
    Pallas pass over the particle state (ops/pallas_fused_step.py):
    diff-drive sampling, window coordinates, the θ-slab lookup and the
    weight log all happen per lane tile with no [N]-sized intermediates.
    The window is built around the *predicted* center (pre-propagate
    cloud mean ∘ noiseless odometry delta) so the build precedes the
    kernel; requires a DifferentialDriveParams motion model and
    ``exact_tail_frac=0`` (the selective-resampling flagship regime —
    strays score miss and are culled at the next resample).

    Per update the reweight builds a ``k_bins × win × win`` pose-likelihood
    window around the propagated cloud's mean (DFT correlation on the MXU,
    ~3 ms/scan regardless of particle count) and scores every particle with
    one θ-lerped MXU lookup (models/sensor/likelihood_field_winlut.py) —
    beam-count- and particle-count-decoupled.  A coverage gate (computed
    from the window *origin*, before paying for the build) falls back to
    the exact codebook reweight when the cloud doesn't fit the window
    (global localization, recovery bursts), so convergence behavior is
    preserved.

    Contracts: single filter only (under ``vmap`` the ``lax.cond`` lowers
    to ``select`` and both paths execute — use
    :func:`make_winlut_fleet_update` for fleets); requires
    ``AmclParams(sorted_slots=True)`` (θ-sorted slots keep each lane tile
    within the kernel's ``tblk``-bin θ slab).

    **Hybrid tail**: the strays-last sort key (filters/amcl.py
    se2_sort_key) pools the posterior's diffuse stray tail (~2-10% of
    slots under the flat pz³ likelihood) into the LAST slots, whose mixed
    θ blows their tile slabs — scored through the kernel alone they would
    take the miss weight and hold steady-state coverage below any usable
    threshold.  The reweight therefore scores the last
    ``exact_tail_frac`` of slots (tile-aligned) with the exact per-beam
    model and the prefix with the winlut kernel, and the coverage gate
    counts the prefix only.  ``exact_tail_frac=0`` disables the hybrid.

    **Scan-replay caveat**: inside ``lax.scan`` XLA flattens the gate's
    ``lax.cond`` to a select, so BOTH reweights execute every step and
    the fast path saves nothing.  ``coverage_threshold <= 0`` removes the
    gate and the exact branch from the graph entirely (hybrid winlut
    only) — for gap-free tracking replays (e.g. the bench tracking
    workload) where the system-tested gated config has established the
    accuracy envelope; recovery-burst regimes must keep the gate.

    Returns ``(models, ctx)``.
    """
    from beluga_tpu.models.sensor.likelihood_field import (
        likelihood_field_weights,
        likelihood_field_weights_codebook,
    )
    from beluga_tpu.models.sensor.likelihood_field_winlut import (
        build_windowed_scan_lut,
        windowed_coverage_tiled_from_center,
        windowed_scan_lut_weights,
    )

    res_hint = grid.resolution_hint
    on_tpu = jax.default_backend() == "tpu"
    geo = dict(
        k_bins=k_bins, win=win, dth=dth, max_point_radius=max_point_radius,
        resolution_hint=res_hint,
    )

    def exact_weights(ctx, states, points, beam_mask):
        if on_tpu:
            return likelihood_field_weights_codebook(
                ctx["field"], ctx["field_codes"], states, points, beam_mask
            )
        return likelihood_field_weights(ctx["field"], states, points, beam_mask)

    def log_weight(ctx, states, points, beam_mask):
        field = ctx["field"]
        n = states.x.shape[0]
        s_tail = _exact_tail_slots(n, tile, exact_tail_frac)

        cx = jnp.mean(states.xy[..., 0])
        cy = jnp.mean(states.xy[..., 1])
        ct = jnp.arctan2(jnp.mean(states.rot.sin), jnp.mean(states.rot.cos))

        def fast(_):
            lut = build_windowed_scan_lut(
                field, points, beam_mask, cx, cy, ct,
                table_dtype=table_dtype,
                padded_cubed=ctx.get("field_pad3"), **geo,
            )
            # clamp before the log: bf16 Gibbs ringing near unknown-space
            # discontinuities can push 1 + Σpz³ non-positive, and a single
            # NaN log-weight poisons the whole normalization (same
            # convention as the beam path below)
            kernel_states = states
            if s_tail:  # tile-aligned: skip the kernel work for the tail
                kernel_states = jax.tree_util.tree_map(
                    lambda l: l[: n - s_tail], states
                )
            w = windowed_scan_lut_weights(
                lut, kernel_states, tile=tile, tblk=tblk,
                interpret=not on_tpu,
            )
            if s_tail:
                tail = jax.tree_util.tree_map(lambda l: l[n - s_tail:], states)
                w_tail = exact_weights(ctx, tail, points, beam_mask)
                w = jnp.concatenate([w, w_tail])
            return jnp.log(jnp.maximum(w, 1e-30))

        if coverage_threshold <= 0.0:
            # gate-free tracking mode: no exact branch in the graph (see
            # the scan-replay caveat in the docstring)
            return fast(None)

        prefix = jax.tree_util.tree_map(lambda l: l[: n - s_tail], states)
        # kernel-exact gate on the PREFIX: models the per-tile theta-slab,
        # so a sorted_slots contract violation or an over-spread cloud
        # trips the exact fallback instead of silently scoring miss
        cov = windowed_coverage_tiled_from_center(
            field, prefix, cx, cy, ct, tile=tile, tblk=tblk, **geo
        )

        def exact(_):
            return jnp.log(exact_weights(ctx, states, points, beam_mask))

        return jax.lax.cond(cov >= coverage_threshold, fast, exact, None)

    fused_fn = None
    if fused:
        if not isinstance(motion_params, DifferentialDriveParams):
            raise ValueError(
                "fused=True requires a DifferentialDriveParams motion model "
                "(the fused kernel implements its sampler in-kernel)"
            )
        if exact_tail_frac > 0.0:
            raise ValueError(
                "fused=True requires exact_tail_frac=0 (the fused kernel "
                "scores every slot; strays take the miss weight)"
            )
        from beluga_tpu.lie import SE2, SO2
        from beluga_tpu.models.motion.differential_drive import (
            diff_drive_decompose,
        )
        from beluga_tpu.ops.pallas_fused_step import (
            fused_propagate_winlut,
            pack_scalars,
        )

        k_bins_ = k_bins

        def fused_fn(ctx, key, states, pose, prev, points, beam_mask):
            field = ctx["field"]
            # predicted window center: pre-propagate cloud mean composed
            # with the noiseless odometry delta (the same construction as
            # make_winlut_fleet_update's prediction) — lets the LUT build
            # precede the fused kernel; the prediction differs from the
            # propagated mean by the O(noise/√N) sample mean shift, far
            # inside the window margins
            delta = prev.inverse() @ pose
            mth = jnp.arctan2(
                jnp.mean(states.rot.sin), jnp.mean(states.rot.cos)
            )
            mean_pose = SE2.from_xytheta(
                jnp.mean(states.x), jnp.mean(states.y), mth
            )
            pred = mean_pose @ delta
            cx, cy, ct = pred.x, pred.y, pred.theta

            def fast(_):
                lut = build_windowed_scan_lut(
                    field, points, beam_mask, cx, cy, ct,
                    table_dtype=table_dtype,
                    padded_cubed=ctx.get("field_pad3"), **geo,
                )
                (r1m, r1s), (tm, ts), (r2m, r2s) = diff_drive_decompose(
                    motion_params, pose, prev
                )
                wf = lut.world_to_field
                wf_angle = jnp.arctan2(wf.rot.sin, wf.rot.cos)
                center = lut.theta0 + (k_bins_ // 2) * dth
                scal = pack_scalars(
                    r1m, r1s, tm, ts, r2m, r2s, wf,
                    1.0 / lut.resolution,
                    -0.5 + (lut.pad_cells - lut.x0.astype(jnp.float32)),
                    -0.5 + (lut.pad_cells - lut.y0.astype(jnp.float32)),
                    wf_angle - center, 1.0 / dth, float(k_bins_ // 2),
                    lut.miss, 1.0,
                )
                # normals from XLA threefry (~0.5 ms/step at 2M): the
                # in-kernel PRNG alternative (kernel_prng=True) measured
                # SLOWER overall (11.0 vs 8.4 ms/step at 2M — Mosaic's
                # per-tile prng_random_bits + Box-Muller costs more VPU
                # time than the threefry fusions it removes; NOTES r5)
                z = jax.random.normal(
                    key, (3, states.x.shape[0]), jnp.float32
                )
                xo, yo, co, so, lw = fused_propagate_winlut(
                    states.x, states.y, states.theta, z,
                    lut.values_t, scal, tile=tile, tblk=tblk,
                    interpret=not on_tpu,
                )
                new_states = SE2(
                    jnp.stack([xo, yo], -1), SO2(jnp.stack([co, so], -1))
                )
                return new_states, lw

            if coverage_threshold <= 0.0:
                return fast(None)

            predicted = states @ delta  # noiseless per-particle prediction
            cov = windowed_coverage_tiled_from_center(
                field, predicted, cx, cy, ct, tile=tile, tblk=tblk, **geo
            )
            propagate = make_motion_fn(motion_params)

            def exact(_):
                ns = propagate(ctx, key, states, pose, prev)
                return ns, jnp.log(exact_weights(ctx, ns, points, beam_mask))

            return jax.lax.cond(cov >= coverage_threshold, fast, exact, None)

    models = AmclModels(
        propagate=make_motion_fn(motion_params),
        log_weight=log_weight,
        random_state=make_grid_random_state_fn(recovery_candidates),
        hash_state=default_hash_state,
        estimate=default_estimate,
        fused_propagate_reweight=fused_fn,
    )
    field = make_likelihood_field(lf_params, grid)
    ctx = {"grid": grid, "field": field}
    # map-static padded pz³ image: the per-scan LUT build otherwise
    # re-cubes + re-pads the field every update (~0.27 ms/step at 1M)
    from beluga_tpu.models.sensor.likelihood_field_winlut import (
        precompute_padded_field,
    )

    ctx["field_pad3"] = precompute_padded_field(
        field, win, max_point_radius, resolution_hint=res_hint
    )
    if on_tpu:
        ctx["field_codes"] = _make_field_codes(field, lf_params, grid)
    return models, ctx


def make_winlut_fleet_update(
    params,
    grid: OccupancyGrid,
    lf_params: LikelihoodFieldParams = LikelihoodFieldParams(),
    motion_params: Any = DifferentialDriveParams(),
    k_bins: int = 64,
    win: int = 128,
    dth: float = 2.0 * 3.141592653589793 / 128.0,
    max_point_radius: float = 4.0,
    tile: int = 512,
    tblk: int = 16,
    coverage_threshold: float = 0.98,
    recovery_candidates: int = 256,
    exact_tail_frac: float = 0.125,
):
    """Fleet AMCL through ONE shared windowed pose LUT per update, for B
    filters scoring the *same* scan (Monte Carlo replicas / evaluation
    sweeps over one robot).

    **Fast-path recommendation (measured, NOTES.md r3/r4):** at fleet
    scale (e.g. 64 x 4096) this path does NOT beat the exact
    ``lookup_mode="codebook16"`` fleet step — the wide nav2 posterior
    (sigma_theta ~0.3 rad + stray tail) fights the per-filter tile
    structure, and build+gate+lookup+tail lands at about the codebook16
    reweight it replaces.  Use ``make_likelihood_field_filter(...,
    lookup_mode="codebook16")`` with ``parallel.fleet.make_fleet_update``
    for fleets; the winlut win is at MEGA scale (one filter, >= 262k
    particles, ``make_windowed_scan_filter``) where the build amortizes
    over the particle count.  This path remains for shared-scan fleets
    whose per-filter clouds are tighter than the nav2 posterior.

    The ``lax.cond`` coverage gate of :func:`make_windowed_scan_filter`
    cannot ride under ``vmap`` (it lowers to ``select`` and both paths
    execute); here the branch sits *outside* the fleet vmap, so it
    compiles to a real branch:

      1. predict post-propagate particle poses by composing every particle
         with its filter's noiseless odometry delta (the deterministic
         part of the diff-drive update);
      2. build the window around the fleet-global predicted mean and gate
         on the MIN per-filter kernel-exact coverage (a single diverged
         filter must trip the fallback — its miss-weights would otherwise
         degrade silently);
      3. fast branch: one DFT correlation build (paid once for the whole
         fleet), winlut MXU lookup vmapped per filter;
         fallback branch: the exact codebook16 fleet step.

    Contracts: every filter must carry the same scan (``points[0]`` /
    ``masks[0]`` feed the build); ``params.sorted_slots`` must be set
    (per-tile θ-slabs).  Returns ``(step, ctx)`` with
    ``step(ctx, state, odoms, points, masks)`` shaped like
    ``parallel.fleet.make_fleet_update``'s return.

    Reference behavior: likelihood_field_model.hpp:68-91 semantics through
    the windowed LUT approximation (accuracy bounds in tests/test_winlut.py
    and the system gate of tests/test_system_winlut.py).
    """
    import functools

    from beluga_tpu.filters.amcl import update
    from beluga_tpu.models.sensor.likelihood_field_winlut import (
        build_windowed_scan_lut,
        windowed_coverage_tiled_from_center,
        windowed_scan_lut_weights,
    )

    if not params.sorted_slots:
        raise ValueError(
            "make_winlut_fleet_update requires AmclParams(sorted_slots=True): "
            "the winlut kernel windows each lane tile to a theta slab"
        )

    on_tpu = jax.default_backend() == "tpu"
    res_hint = grid.resolution_hint
    geo = dict(
        k_bins=k_bins, win=win, dth=dth, max_point_radius=max_point_radius,
        resolution_hint=res_hint,
    )

    # exact fallback: the codebook16 fleet configuration (same models/ctx as
    # make_likelihood_field_filter)
    models_exact, ctx = make_likelihood_field_filter(
        grid, lf_params, motion_params,
        lookup_mode="codebook16" if on_tpu else "auto",
        recovery_candidates=recovery_candidates,
    )

    def log_weight_fast(fctx, states, points, beam_mask):
        # hybrid tail (see make_windowed_scan_filter): the strays-last
        # sort pools each filter's stray tail into its last slots; score
        # those with the exact model, the prefix through the shared LUT
        n = states.x.shape[0]
        s_tail = _exact_tail_slots(n, tile, exact_tail_frac)
        kernel_states = states
        if s_tail:  # tile-aligned: skip the kernel work for the tail
            kernel_states = jax.tree_util.tree_map(
                lambda l: l[: n - s_tail], states
            )
        log_w = jnp.log(jnp.maximum(
            windowed_scan_lut_weights(
                fctx["winlut"], kernel_states, tile=tile, tblk=tblk,
                interpret=not on_tpu,
            ),
            1e-30,
        ))
        if s_tail:
            tail = jax.tree_util.tree_map(lambda l: l[n - s_tail:], states)
            logw_tail = models_exact.log_weight(
                fctx, tail, points, beam_mask
            )
            log_w = jnp.concatenate([log_w, logw_tail])
        return log_w

    models_fast = models_exact._replace(log_weight=log_weight_fast)

    fast_step = jax.vmap(
        functools.partial(update, params, models_fast),
        in_axes=(None, 0, 0, 0, 0),
    )
    exact_step = jax.vmap(
        functools.partial(update, params, models_exact),
        in_axes=(None, 0, 0, 0, 0),
    )

    def step(ctx, state, odoms, points, masks):
        field = ctx["field"]
        from beluga_tpu.core.particles import tree_where

        # noiseless motion prediction: state ∘ (prev⁻¹ ∘ odom) per filter
        prev = tree_where(state.control_seeded, state.control_prev, odoms)
        delta = prev.inverse() @ odoms  # [B]
        expand = jax.vmap(lambda s, d: s @ d, in_axes=(0, 0))
        predicted = expand(state.particles.state, delta)  # [B, N]

        flat = jax.tree_util.tree_map(
            lambda l: l.reshape((-1,) + l.shape[2:]), predicted
        )
        cx = jnp.mean(flat.xy[..., 0])
        cy = jnp.mean(flat.xy[..., 1])
        ct = jnp.arctan2(jnp.mean(flat.rot.sin), jnp.mean(flat.rot.cos))
        n = predicted.x.shape[1]
        s_tail = _exact_tail_slots(n, tile, exact_tail_frac)
        cov_b = jax.vmap(
            lambda st: windowed_coverage_tiled_from_center(
                field,
                jax.tree_util.tree_map(lambda l: l[: n - s_tail], st),
                cx, cy, ct, tile=tile, tblk=tblk, **geo,
            )
        )(predicted)
        use_fast = jnp.min(cov_b) >= coverage_threshold

        def fast(_):
            lut = build_windowed_scan_lut(
                field, points[0], masks[0], cx, cy, ct, **geo
            )
            return fast_step({**ctx, "winlut": lut}, state, odoms, points, masks)

        def exact(_):
            return exact_step(ctx, state, odoms, points, masks)

        return jax.lax.cond(use_fast, fast, exact, None)

    return step, ctx


def make_beam_filter(
    grid: OccupancyGrid,
    beam_params=None,
    motion_params: Any = DifferentialDriveParams(),
    use_range_lut: bool | str = False,
    n_bearings: int = 128,
    use_cluster_estimate: bool = False,
    use_sphere_trace: bool = False,
    raycast_variant: str = "standard",
    recovery_candidates: int = 0,
):
    """Assemble the beam-model AMCL configuration.

    ``raycast_variant`` selects the exact-path Bresenham variant
    (``"standard"`` or ``"supercover"``, bresenham.hpp:37-41).

    Fast paths (all opt-in; the exact path ray-marches with the lock-step
    Bresenham):
      * ``use_range_lut=True`` — per-map CDDT-style range LUT, one lookup
        per beam (bearing-quantization error);
      * ``use_range_lut="windowed"`` — the range LUT through the windowed
        Pallas kernel on TPU (ops/pallas_beam_lut.py): the fleet-scale
        tracking path, ~42x the gather LUT; out-of-window strays score as
        all-casts-miss (off-TPU it falls back to the gather LUT);
      * ``use_sphere_trace=True`` — fused Pallas kernel marching the EDT
        (no LUT build, no serialized gathers; ~1-cell range error).
    Returns ``(models, ctx)``.
    """
    from beluga_tpu.models.sensor.beam import BeamModelParams, beam_log_weights

    beam_params = beam_params or BeamModelParams()
    res_hint = grid.resolution_hint

    if use_sphere_trace:
        from beluga_tpu.models.sensor.beam import beam_sphere_trace_log_weights
        from beluga_tpu.ops.pallas_beam import make_distance_cells

        interpret = jax.default_backend() != "tpu"
        # march budget scaled to the range regime: a beam that exhausts it
        # silently scores max_range, and 20 steps only cover ~10 m at cm
        # cells (the 60 m regime diverged at 20, tracks at ~48 —
        # tests/test_system_long_range.py).  ~2·sqrt(max_cells) covers the
        # EDT-jump profile of sparse maps with slack.
        max_cells = beam_params.beam_max_range / res_hint
        march_steps = int(min(96, max(20, 2.0 * max_cells**0.5)))

        def log_weight(ctx, states, points, beam_mask):
            return beam_sphere_trace_log_weights(
                beam_params, ctx["beam_dist"], ctx["grid"], states, points,
                beam_mask, interpret=interpret, march_steps=march_steps,
            )

        ctx = {"grid": grid, "beam_dist": make_distance_cells(grid.free_mask)}
    elif use_range_lut:
        from beluga_tpu.models.sensor.beam_lut import beam_lut_weights, build_range_lut

        lut = build_range_lut(
            grid, max_range=beam_params.beam_max_range, n_bearings=n_bearings
        )

        def log_weight(ctx, states, points, beam_mask):
            w = beam_lut_weights(
                beam_params, ctx["range_lut"], states, points, beam_mask,
                lut_bf16=ctx.get("range_lut_bf16"),
            )
            return jnp.log(jnp.maximum(w, 1e-30))

        ctx = {"grid": grid, "range_lut": lut}
        if use_range_lut == "windowed":
            # fleet-scale fast path: no serialized gathers; out-of-window
            # strays score as all-casts-miss (ops/pallas_beam_lut.py)
            from beluga_tpu.ops.pallas_beam_lut import build_lut_bf16

            ctx["range_lut_bf16"] = build_lut_bf16(lut.ranges)
    else:
        def log_weight(ctx, states, points, beam_mask):
            return beam_log_weights(
                beam_params, ctx["grid"], states, points, beam_mask,
                resolution_hint=res_hint, variant=raycast_variant,
            )

        ctx = {"grid": grid}

    if use_cluster_estimate:
        from beluga_tpu.algorithms.cluster import cluster_based_estimate

        def estimate(params, particles):
            return cluster_based_estimate(particles.state, particles.weight, particles.mask)
    else:
        estimate = default_estimate

    models = AmclModels(
        propagate=make_motion_fn(motion_params),
        log_weight=log_weight,
        random_state=make_grid_random_state_fn(recovery_candidates),
        hash_state=default_hash_state,
        estimate=estimate,
    )
    return models, ctx
