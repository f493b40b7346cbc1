"""Adaptive Monte Carlo Localization — the full filter loop as one XLA program.

TPU re-design of ``beluga::Amcl`` (algorithm/amcl_core.hpp:81-233) and
``beluga_ros::Amcl`` (beluga_ros/src/amcl.cpp:83-126).  The reference
composes lazy range views; here one pure function performs the whole update
(propagate → reweight → normalize → Thrun estimate → resample gate →
[sample | random_intersperse | KLD] → estimate) over dense particle arrays,
with all gating under ``lax.cond`` so the step is a single compiled program.

The update order, gating semantics and parity quirks follow the reference
exactly:
  * the on-motion policy mutates its latest-pose memory *before* the
    force-update check (amcl_core.hpp:170, policies/on_motion.hpp:115-134);
  * the control window only advances on updates that pass the gate
    (amcl_core.hpp:174-175);
  * the Thrun estimator consumes the post-normalize average weight
    (amcl_core.hpp:177-179) — see algorithms/thrun.py;
  * the estimator resets whenever the random-state probability was > 0 and a
    resample fires (amcl_core.hpp:184-186);
  * resampled particles restart with weight 1 (views/sample.hpp via
    make_from_state, amcl_core.hpp:182);
  * ``every_n`` counts gated-in updates and fires on multiples of
    ``resample_interval`` (policies/every_n.hpp:48-51), optionally ANDed with
    the ESS < N/2 drop policy (amcl_core.hpp:121-123).

State is an explicit pytree → the filter nests in jit / vmap (filter fleets)
/ shard_map (sharded mega-filters) / lax.scan (trajectory replay).

Models are plugged in as pure functions over an opaque ``ctx`` pytree (maps,
likelihood fields, …) passed through the update, so maps can be hot-swapped
without recompilation (amcl_node.cpp:469-471).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from beluga_tpu.algorithms.estimation import estimate_se2
from beluga_tpu.algorithms.kld import kld_active_count
from beluga_tpu.algorithms.thrun import ThrunState, thrun_update
from beluga_tpu.core.particles import (
    DEAD_LOG_WEIGHT,
    ParticleSet,
    make_from_states,
    tree_scatter,
    tree_sort_by,
    tree_take,
    tree_where,
)
from beluga_tpu.core.weights import effective_sample_size, normalize
from beluga_tpu.lie import SE2
from beluga_tpu.ops.resample import POSITIONERS, RESAMPLERS

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AmclParams:
    """nav2-parity filter parameters (amcl_core.hpp:34-55 +
    beluga_ros/amcl.hpp:50-98)."""

    update_min_d: float = 0.25
    update_min_a: float = 0.2
    resample_interval: int = 1
    selective_resampling: bool = False
    min_particles: int = 500
    max_particles: int = 2000
    alpha_slow: float = 0.001
    alpha_fast: float = 0.1
    kld_epsilon: float = 0.05
    kld_z: float = 3.0
    spatial_resolution_x: float = 0.5
    spatial_resolution_y: float = 0.5
    spatial_resolution_theta: float = 10.0 * 3.141592653589793 / 180.0
    resampling: str = "multinomial"  # reference default (views/sample.hpp)
    # Recovery-injection pool size.  0 (default, reference-exact) generates
    # max_particles random states every resample; K > 0 generates only K and
    # scatters them onto the injected slots (exact iid while the number of
    # injected slots is <= K; beyond K the injection is clamped for that
    # update).  The reference generates random states lazily per injected
    # slot (views/random_intersperse.hpp:93-115), so K bounds the generation
    # work the same way — random gathers are the serialized op on TPU.
    recovery_pool: int = 0
    # Keep particle slots in theta-sorted order: slot order is
    # statistically irrelevant to the filter, but theta-sorted slots let
    # the Pallas reweight kernels window each lane sub-block to a narrow
    # theta band (ops/pallas_reweight.py, ops/pallas_winlut.py).  With a
    # fixed count (min == max) the resampler keeps donors in input order
    # (interleave skipped) and re-sorts after injection.  With adaptive
    # KLD (min < max) the active count is computed on draw-order (or, for
    # CDF-ordered strategies, deterministically interleaved) candidates
    # first (reference take_while_kld parity — an unbiased prefix,
    # views/take_while_kld.hpp:72-88), and the theta sort then
    # moves the kept k particles to the front ordered by theta (dropped
    # slots last, dead-masked) — so the KLD subset is order-unbiased AND
    # the live prefix satisfies the kernels' theta-band contract.
    sorted_slots: bool = False
    # Re-sort every Nth resample instead of every one (perf knob for
    # sorted_slots mega filters; the 7-operand theta sort costs ~2.6 ms at
    # 1M particles).  Slot sortedness is a performance HINT: the winlut
    # kernel's tblk-deep theta slab tolerates the ~0.1 rad/step diffusion
    # of motion noise for several steps before tiles overflow their slab
    # (overflowing particles score miss and fall to the exact tail /
    # coverage gate, so accuracy degrades gracefully, not silently).
    # Requires a fixed particle count: with adaptive KLD the sort also
    # maintains the kept-first live-prefix invariant and cannot be
    # skipped.
    sort_interval: int = 1

    def __post_init__(self):
        if (
            self.sort_interval > 1
            and self.min_particles < self.max_particles
        ):
            raise ValueError(
                "sort_interval > 1 requires a fixed particle count "
                "(min_particles == max_particles): adaptive KLD relies on "
                "the per-resample sort for the kept-first live prefix"
            )


class AmclModels(NamedTuple):
    """Pure model functions; every function takes the opaque ``ctx`` pytree.

    propagate:    (ctx, key, states, pose, prev_pose) -> states
    log_weight:   (ctx, states, points, beam_mask) -> f32[N] log-likelihoods
    random_state: (ctx, key, n, particles) -> states  (recovery generator;
                  may condition on the current particle set like the
                  estimate-based generator of the NDT nodes,
                  amcl_core.hpp:208-214)
    hash_state:   (params, states) -> u32[N] spatial hashes (KLD buckets)
    estimate:     (params, particles) -> (mean pose, covariance)
    motion_delta: (prev_pose, pose) -> (distance, angle) for the on-motion
                  gate; ``None`` selects the SE2 default
                  (policies/on_motion.hpp:63-76 / SE3 variant :115-134).
    """

    propagate: Callable
    log_weight: Callable
    random_state: Callable
    hash_state: Callable
    estimate: Callable
    motion_delta: Callable | None = None
    # optional fused forward: (ctx, key, states, pose, prev_pose, points,
    # beam_mask) -> (new_states, log_lik) replacing the separate
    # propagate + log_weight calls with one Pallas pass over the particle
    # state (ops/pallas_fused_step.py) — the mega-filter fast path.
    fused_propagate_reweight: Callable | None = None
    # sort key for ``sorted_slots`` filters: (states) -> f32[N]; None uses
    # ``se2_sort_key`` (theta + strays-last).  Slot order is statistically
    # irrelevant; the
    # theta sort only exists so the Pallas reweight fast path sees narrow
    # theta bands per lane sub-block (ops/pallas_reweight.py).
    sort_key: Callable | None = None


class AmclState(NamedTuple):
    particles: ParticleSet
    key: Array
    thrun: ThrunState
    resample_count: Array  # i32, every_n internal counter
    motion_latest: SE2  # on_motion policy memory
    motion_seeded: Array  # bool
    control_prev: SE2  # 2-deep odometry rolling window (previous entry)
    control_seeded: Array  # bool
    force_update: Array  # bool


class Estimate(NamedTuple):
    pose: SE2
    covariance: Array  # f32[3, 3]
    valid: Array  # bool — False when the update was gated out


def se2_sort_key(states: SE2) -> Array:
    """Slot-sort key for ``sorted_slots`` SE2 filters: theta, with outlier
    particles pushed to the end.

    The reweight fast path (ops/pallas_reweight.py) windows each lane
    sub-block; a theta sort alone leaves the posterior's diffuse xy tail
    (~2-3% of survivors under the flat pz^3 likelihood) spread across every
    theta band, blowing each block's window.  A two-level key — outlier
    flag first, theta second — pools the strays into the last block(s),
    which the kernel flags for its exact full-table path, leaving the core
    blocks as tight (theta, xy) bands.  Outliers = beyond 3.5 sigma of the
    cloud in x, y, or heading-chord distance.  Slot order is statistically
    irrelevant to the filter, so the key only affects kernel efficiency.
    """
    x, y = states.xy[..., 0], states.xy[..., 1]
    theta = states.theta
    c, s = states.rot.cos, states.rot.sin
    zx = jnp.abs(x - jnp.mean(x)) / (jnp.std(x) + 1e-6)
    zy = jnp.abs(y - jnp.mean(y)) / (jnp.std(y) + 1e-6)
    rc = jnp.hypot(c - jnp.mean(c), s - jnp.mean(s))
    zt = (rc - jnp.mean(rc)) / (jnp.std(rc) + 1e-6)
    stray = (zx > 3.5) | (zy > 3.5) | (zt > 3.5)
    return theta + 100.0 * stray.astype(jnp.float32)


def default_hash_state(params: AmclParams, states: SE2) -> Array:
    from beluga_tpu.ops.spatial_hash import spatial_hash_se2

    return spatial_hash_se2(
        states.xy,
        states.theta,
        params.spatial_resolution_x,
        params.spatial_resolution_theta,
        res_y=params.spatial_resolution_y,
    )


def default_estimate(params: AmclParams, particles: ParticleSet):
    del params
    return estimate_se2(particles.state, particles.weight, particles.mask)


def init_state(
    key: Array, states: Any, params: AmclParams, odom_identity: Any | None = None
) -> AmclState:
    """Initialize the filter from max_particles pre-sampled states.

    Mirrors ``Amcl::initialize`` (amcl_core.hpp:131-137): particles get
    weight 1 and a forced update is scheduled.  ``odom_identity`` sets the
    control/odometry pose type (default SE2; pass ``SE3.identity()`` for 3D
    filters).
    """
    particles = make_from_states(states)
    assert particles.capacity == params.max_particles, (
        f"need exactly max_particles={params.max_particles} initial states, "
        f"got {particles.capacity}"
    )
    if odom_identity is None:
        odom_identity = SE2.identity()
    return AmclState(
        particles=particles,
        key=key,
        thrun=ThrunState.init(),
        resample_count=jnp.int32(0),
        motion_latest=odom_identity,
        motion_seeded=jnp.asarray(False),
        control_prev=odom_identity,
        control_seeded=jnp.asarray(False),
        force_update=jnp.asarray(True),
    )


def reinit_particles(state: AmclState, states: Any) -> AmclState:
    """Replace the particle set (pose re-initialization / global relocation),
    keeping odometry memory; schedules a forced update."""
    return state._replace(
        particles=make_from_states(states), force_update=jnp.asarray(True)
    )


def se2_motion_delta(prev: SE2, pose: SE2):
    """(translation, |rotation|) of the relative motion (on_motion.hpp:63-76)."""
    delta = prev.inverse() @ pose
    return jnp.linalg.norm(delta.xy, axis=-1), jnp.abs(delta.theta)


def se3_motion_delta(prev, pose):
    """SE3 variant using the rotation angle (on_motion.hpp:115-134)."""
    delta = prev.inverse() @ pose
    angle = jnp.linalg.norm(delta.rot.log(), axis=-1)
    return jnp.linalg.norm(delta.xyz, axis=-1), angle


def _on_motion(params: AmclParams, models: "AmclModels", latest, seeded: Array, pose):
    """Stateful on_motion policy (policies/on_motion.hpp:63-76, 115-134)."""
    delta_fn = models.motion_delta or se2_motion_delta
    dist, angle = delta_fn(latest, pose)
    moved_now = (dist > params.update_min_d) | (angle > params.update_min_a)
    moved = (~seeded) | moved_now
    new_latest = tree_where(moved, pose, latest)
    return moved, new_latest


def update(
    params: AmclParams,
    models: AmclModels,
    ctx: Any,
    state: AmclState,
    odom_pose: SE2,
    points: Array,
    beam_mask: Array,
    *,
    sort_now: bool | None = None,
) -> tuple[AmclState, Estimate]:
    """One filter update. Pure; jit/vmap/scan-compatible.

    Args:
      ctx: opaque map/model context pytree forwarded to model functions.
      odom_pose: base pose in the odom frame (the control action).
      points: ``f32[B, 2]`` measurement points in the base frame.
      beam_mask: ``bool[B]`` validity mask for the (static-size) beam slots.
      sort_now: STATIC override of the ``sorted_slots`` sort schedule.
        ``None`` (default) follows ``params.sort_interval`` with a runtime
        conditional; ``True``/``False`` sorts (or not) unconditionally —
        callers driving a ``lax.scan`` replay can unroll the schedule
        statically (e.g. 4 sub-steps per scan iteration, sorting on the
        first), removing the conditional and its particle-buffer copies
        (~1 ms/step at 1M on v5e).
    """
    moved, motion_latest = _on_motion(
        params, models, state.motion_latest, state.motion_seeded, odom_pose
    )
    state = state._replace(motion_latest=motion_latest, motion_seeded=jnp.asarray(True))
    do_update = moved | state.force_update

    def heavy(state: AmclState) -> tuple[AmclState, Estimate]:
        key, k_prop, k_res, k_rand, k_mask = jax.random.split(state.key, 5)
        particles = state.particles
        mask = particles.mask

        # -- control window << pose (amcl_core.hpp:174-175) -----------------
        prev_pose = tree_where(state.control_seeded, state.control_prev, odom_pose)

        # -- propagate | reweight | normalize -------------------------------
        if models.fused_propagate_reweight is not None:
            new_states, log_lik = models.fused_propagate_reweight(
                ctx, k_prop, particles.state, odom_pose, prev_pose, points,
                beam_mask,
            )
        else:
            new_states = models.propagate(
                ctx, k_prop, particles.state, odom_pose, prev_pose
            )
            log_lik = models.log_weight(ctx, new_states, points, beam_mask)
        log_w = jnp.where(mask, particles.log_weight + log_lik, DEAD_LOG_WEIGHT)
        particles = ParticleSet(new_states, log_w, particles.active)
        particles = normalize(particles)

        # -- Thrun recovery probability (post-normalize, amcl_core.hpp:179) -
        avg_weight = 1.0 / jnp.maximum(particles.active.astype(jnp.float32), 1.0)
        thrun, p_random = thrun_update(
            state.thrun, params.alpha_slow, params.alpha_fast, avg_weight
        )

        # -- resample policy: every_n [&& ESS drop] -------------------------
        # the counter cycles over resample_interval * sort_interval so it
        # can drive BOTH gates: resample at multiples of the interval,
        # theta re-sort at every sort_interval-th resample (count == 0)
        modulus = params.resample_interval * max(params.sort_interval, 1)
        resample_count = jnp.mod(state.resample_count + 1, modulus)
        do_resample = jnp.mod(resample_count, params.resample_interval) == 0
        if params.selective_resampling:
            ess = effective_sample_size(particles)
            do_resample &= ess < 0.5 * particles.active.astype(jnp.float32)

        def do_resample_branch(args):
            particles, thrun = args
            # reset the estimator after injecting randomness
            # (amcl_core.hpp:184-186)
            thrun = jax.tree_util.tree_map(
                lambda a, b: jnp.where(p_random > 0.0, a, b), ThrunState.init(), thrun
            )
            m = params.max_particles
            adaptive = params.min_particles < params.max_particles
            # Donors emitted in CDF (input-index) order need a deterministic
            # interleave whenever the adaptive-KLD prefix semantics are
            # active: the prefix of a CDF-ordered donor array is "particles
            # below a CDF cutoff" — a censored posterior, not an unbiased
            # subsample.  Multinomial donors in draw order are already
            # exchangeable; every other strategy sets ``cdf_ordered``.
            cdf_ordered = False
            if jax.default_backend() == "tpu" and params.resampling == "residual":
                # residual through the fused kernel: the deterministic
                # floor(M·w) copies are EXACT stratified positions over the
                # floor-count CDF ((j+0.5)/R0 hits particle i exactly
                # count_i times); the residual slots j >= r0 get the order
                # statistics of exactly m - r0 uniforms searched in the
                # residual CDF (the textbook residual resampler).  2 kernel
                # passes replace the serialized searchsorted+gather
                # (25.5 -> ~2 ms per fleet step, benchmarks/REPORT.md r3).
                from beluga_tpu.ops.pallas_resample import resample_take_tree
                from beluga_tpu.ops.resample import (
                    sorted_residual_multinomial_positions,
                )

                w = particles.weight
                wn = w / jnp.maximum(jnp.sum(w), 1e-38)
                counts = jnp.floor(wn * m)
                r0 = jnp.sum(counts)
                slots = jnp.arange(m, dtype=jnp.float32)
                u_det = jnp.where(
                    slots < r0, (slots + 0.5) / jnp.maximum(r0, 1.0), 1.5
                )
                donors_det = resample_take_tree(counts, u_det, particles.state)
                u_res = sorted_residual_multinomial_positions(k_res, r0, m)
                donors_res = resample_take_tree(
                    wn * m - counts, u_res, particles.state
                )
                donors = tree_where(slots < r0, donors_det, donors_res)
                cdf_ordered = True
            elif jax.default_backend() == "tpu" and params.resampling in POSITIONERS:
                # fused Pallas CDF-search + donor copy: the interval mask is
                # the donor one-hot, the copy rides the MXU (bit-exact;
                # ~4x the searchsorted + serialized-gather path)
                if params.resampling == "multinomial":
                    # sorted order statistics keep the kernel block-local
                    # (iid positions sweep all blocks: 220 ms vs 4.7 ms at
                    # 262k); exact multinomial donor multiset, interleaved
                    # slot order.  Adaptive KLD needs draw order for the
                    # unbiased prefix even with sorted_slots (the theta
                    # sort happens after the count, kept-first).
                    from beluga_tpu.ops.pallas_resample import (
                        resample_take_tree_multinomial,
                    )

                    donors = resample_take_tree_multinomial(
                        k_res, particles.weight, particles.state, m,
                        interleave=adaptive or not params.sorted_slots,
                    )
                else:
                    from beluga_tpu.ops.pallas_resample import resample_take_tree

                    u = POSITIONERS[params.resampling](k_res, m)
                    donors = resample_take_tree(particles.weight, u, particles.state)
                    cdf_ordered = True
            else:
                resampler = RESAMPLERS[params.resampling]
                idx = resampler(k_res, particles.weight, m)
                donors = tree_take(particles.state, idx)
                cdf_ordered = params.resampling != "multinomial"
            if adaptive and cdf_ordered:
                # spread consecutive CDF regions across the slot axis so any
                # slot prefix (the KLD active prefix) covers the whole CDF
                # near-uniformly; a transpose, not a gather (ops/resample.py)
                from beluga_tpu.ops.resample import interleave_slots

                donors = jax.tree_util.tree_map(interleave_slots, donors)
            pool = params.recovery_pool
            if pool and pool < m:
                # bounded-pool injection without per-slot machinery: draw
                # the injected COUNT k ~ Binomial(m, p) (clamped to the
                # pool) and place the k pool entries at iid uniform slots.
                # Marginally each slot injects with probability ~p exactly
                # as the reference's per-slot Bernoulli
                # (views/random_intersperse.hpp:93-115); target collisions
                # (≤ pool²/2m, e.g. 0.8% of entries at 4096/1M) drop a few
                # injections, within the approximation the bounded pool
                # already makes.  Replaces an m-element Bernoulli draw +
                # m-element stable argsort (~1.7 ms at 1M) with O(pool)
                # work.
                randoms = models.random_state(ctx, k_rand, pool, particles)
                k_cnt, k_slot = jax.random.split(k_mask)
                n_inj = jnp.minimum(
                    jax.random.binomial(k_cnt, m, p_random), float(pool)
                )
                slots_r = jax.random.randint(k_slot, (pool,), 0, m)
                valid = jnp.arange(pool) < n_inj
                target = jnp.where(valid, slots_r, m)  # m -> dropped
                candidates = tree_scatter(donors, target, randoms)
            else:
                inject = jax.random.bernoulli(k_mask, p_random, (m,))
                randoms = models.random_state(ctx, k_rand, m, particles)
                candidates = tree_where(inject, randoms, donors)
            if params.min_particles >= params.max_particles:
                # fixed particle count: take_while_kld's `count <= min`
                # clause takes exactly max particles — skip the spatial
                # hash + distinct-bucket scan entirely
                active = jnp.int32(m)
            else:
                # KLD on the candidates in their draw/CDF order, BEFORE
                # any theta sort — the prefix-selection semantics of
                # take_while_kld.hpp:72-88 (the bucket count itself is
                # order-independent; the prefix is not)
                hashes = models.hash_state(params, candidates)
                active = kld_active_count(
                    hashes, params.min_particles, m, params.kld_epsilon,
                    params.kld_z,
                )
            return make_from_states(candidates, active=active), thrun

        def skip_resample_branch(args):
            return args

        particles, thrun = jax.lax.cond(
            do_resample, do_resample_branch, skip_resample_branch, (particles, thrun)
        )

        if params.sorted_slots and sort_now is not False:
            # keep the theta-sorted slot invariant: per-step motion noise
            # diffuses particle identities across the posterior (timescale
            # ~(sigma_post/sigma_step)^2 steps), so order preservation
            # alone decays — re-sort on the sort schedule.  The sort lives
            # OUTSIDE the resample branch (r4): with selective resampling
            # the branch can stay skipped for long stretches, and an
            # in-branch sort would let slot order decay until the winlut
            # slab overflowed (measured divergence).  The schedule fires
            # every resample_interval * sort_interval updates regardless
            # of whether the resample actually ran.  log-weights travel
            # with the states (they are only uniform right after a
            # resample); dead slots sort last (inf keys) so the live
            # prefix invariant holds for adaptive KLD too.
            key_fn = models.sort_key or se2_sort_key

            def do_sort(particles: ParticleSet) -> ParticleSet:
                sort_keys = key_fn(particles.state)
                sort_keys = jnp.where(particles.mask, sort_keys, jnp.inf)
                state_s, log_w_s = tree_sort_by(
                    sort_keys, (particles.state, particles.log_weight)
                )
                return ParticleSet(state_s, log_w_s, particles.active)

            if sort_now is True:
                particles = do_sort(particles)
            elif (
                params.sort_interval > 1
                or params.selective_resampling
                or params.resample_interval > 1
            ):
                # a runtime conditional, honored in un-vmapped (mega)
                # programs — vmapped fleets flatten cond to select and
                # gain nothing from intervals > 1
                particles = jax.lax.cond(
                    resample_count == 0, do_sort, lambda p: p, particles
                )
            else:
                particles = do_sort(particles)

        mean, cov = models.estimate(params, particles)
        new_state = state._replace(
            particles=particles,
            key=key,
            thrun=thrun,
            resample_count=resample_count,
            control_prev=odom_pose,
            control_seeded=jnp.asarray(True),
            force_update=jnp.asarray(False),
        )
        return new_state, Estimate(mean, cov, jnp.asarray(True))

    def skip(state: AmclState) -> tuple[AmclState, Estimate]:
        mean, cov = models.estimate(params, state.particles)
        return state, Estimate(mean, cov, jnp.asarray(False))

    out = jax.lax.cond(do_update, heavy, skip, state)
    # Barrier: without it XLA forwards input buffers (e.g. odom_pose) to
    # several output leaves; jit then sees a *different* duplicate-buffer
    # pattern on subsequent calls and the fastpath trips over the cached
    # executable signature.  The barrier guarantees distinct output buffers.
    return jax.lax.optimization_barrier(out)
