"""Explicit shard_map mega-filter: one AMCL filter sharded across devices.

The GSPMD path (parallel/fleet.py) lets XLA insert collectives from
sharding annotations.  This module is the hand-scheduled equivalent — the
TPU analog of a distributed particle-filter backend (the reference has
none; its only parallelism is shared-memory PSTL, SURVEY.md §2.5): the
particle axis of a single filter lives split across the ``tp`` mesh axis,
every reduction in the loop is an explicit collective over ICI/DCN, and
resampling is globally stratified so donor exchange is one all_gather.

Per-stage layout (axis name ``tp``; S shards, N_local particles each):

  propagate   local; per-shard key = fold_in(key, shard_index)
  reweight    local (model fns are per-particle; ctx replicated)
  normalize   logsumexp via pmax + psum          (collectives.py)
  Thrun       global active count via psum
  ESS         psum of squared normalized weights
  resample    systematic positions for *this shard's* output slots over
              the global CDF (cumsum + exclusive shard-offset exchange),
              donors fetched from an all_gather of the particle state
  injection   Bernoulli per local slot; generator keyed per shard
  KLD         spatial hashes all_gather'ed, distinct-prefix count on the
              replicated global slot order (take_while_kld parity)
  estimate    weighted SE2 mean/cov via psum (estimation.hpp:436-475)

RNG note: shard streams derive from fold_in(key, shard) — statistically
equivalent to the dense filter (the reference's own parity bar, its
mt19937 draws are thread-placement-dependent too), not bitwise equal.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from beluga_tpu.algorithms.kld import distinct_prefix_count, kld_target_size
from beluga_tpu.algorithms.thrun import ThrunState, thrun_update
from beluga_tpu.core.particles import DEAD_LOG_WEIGHT, ParticleSet, tree_where
from beluga_tpu.filters.amcl import AmclParams, AmclModels, AmclState, Estimate, _on_motion
from beluga_tpu.lie import SE2
from beluga_tpu.parallel.collectives import (
    sharded_cdf,
    sharded_logsumexp,
)

Array = jax.Array


def _all_gather_states(states: Any, axis: str) -> Any:
    """all_gather each leaf along the particle axis (shard-order = global)."""

    def gather(leaf):
        g = jax.lax.all_gather(leaf, axis)  # [S, N_local, ...]
        return g.reshape((-1,) + leaf.shape[1:])

    return jax.tree_util.tree_map(gather, states)


def _sharded_estimate_se2(states: SE2, w: Array, axis: str):
    """Weighted SE2 mean + covariance with explicit psums
    (port of estimation.hpp:436-475, matching algorithms/estimation.py)."""
    wsum = jax.lax.psum(jnp.sum(w), axis)
    wn = w / jnp.maximum(wsum, 1e-38)
    mx = jax.lax.psum(jnp.sum(wn * states.x), axis)
    my = jax.lax.psum(jnp.sum(wn * states.y), axis)
    mc = jax.lax.psum(jnp.sum(wn * states.rot.cos), axis)
    ms = jax.lax.psum(jnp.sum(wn * states.rot.sin), axis)
    norm = jnp.hypot(mc, ms)
    mean = SE2.from_xytheta(mx, my, jnp.arctan2(ms, mc))

    dx = states.x - mx
    dy = states.y - my
    sq = jax.lax.psum(jnp.sum(wn * wn), axis)
    corr = 1.0 / jnp.maximum(1.0 - sq, 1e-9)
    cxx = jax.lax.psum(jnp.sum(wn * dx * dx), axis) * corr
    cxy = jax.lax.psum(jnp.sum(wn * dx * dy), axis) * corr
    cyy = jax.lax.psum(jnp.sum(wn * dy * dy), axis) * corr
    # circular yaw variance -2 log ||mean complex||; degenerate -> inf
    yaw_var = jnp.where(norm > 1e-9, -2.0 * jnp.log(norm), jnp.inf)
    cov = jnp.stack(
        [
            jnp.stack([cxx, cxy, jnp.float32(0)]),
            jnp.stack([cxy, cyy, jnp.float32(0)]),
            jnp.stack([jnp.float32(0), jnp.float32(0), yaw_var]),
        ]
    )
    return mean, cov


def make_mega_update(params: AmclParams, models: AmclModels, mesh: Mesh,
                     axis: str = "tp", estimate_fn=None):
    """Full AMCL update for one particle-sharded filter.

    Returns ``update(ctx, state, odom_pose, points, beam_mask) ->
    (state, Estimate)`` where the particle leaves of ``state`` are sharded
    ``P(axis)`` on ``mesh`` and everything else is replicated.  All four
    resampling strategies are supported: each shard draws the positions of
    its own output slots and searches them in the all-gathered global CDF
    (systematic/stratified ride shared/iid per-rank offsets, multinomial is
    per-shard iid, residual splits global ranks at the floor-copy count
    r0).  ``sorted_slots`` is not supported (a global cross-shard sort
    would serialize the step); adaptive KLD interleaves the ranks of
    CDF-ordered strategies so the kept slot prefix is an unbiased
    subsample.

    ``estimate_fn(states_local, weights_local, axis) -> (pose, cov)`` must
    reduce with collectives over ``axis``; the default is the SE2 estimate
    (pass an SE3 variant for 3D mega filters).
    """
    if estimate_fn is None:
        estimate_fn = _sharded_estimate_se2
    if params.sorted_slots:
        raise ValueError(
            "sorted_slots is unsupported on the sharded mega path "
            "(requires a global cross-shard sort); use the vmap fleet path"
        )
    num_shards = mesh.shape[axis]
    n_total = params.max_particles
    assert n_total % num_shards == 0, "max_particles must divide the mesh axis"
    n_local = n_total // num_shards

    def sharded_update(ctx, state: AmclState, odom_pose, points, beam_mask):
        shard = jax.lax.axis_index(axis)
        slot0 = shard * n_local
        global_slots = slot0 + jnp.arange(n_local)

        moved, motion_latest = _on_motion(
            params, models, state.motion_latest, state.motion_seeded, odom_pose
        )
        state = state._replace(
            motion_latest=motion_latest, motion_seeded=jnp.asarray(True)
        )
        do_update = moved | state.force_update

        def heavy(state):
            key, k_prop, k_res, k_rand, k_mask = jax.random.split(state.key, 5)
            k_prop_s = jax.random.fold_in(k_prop, shard)
            k_rand_s = jax.random.fold_in(k_rand, shard)
            k_mask_s = jax.random.fold_in(k_mask, shard)
            particles = state.particles
            active = particles.active  # global count, replicated
            mask = global_slots < active

            prev_pose = tree_where(
                state.control_seeded, state.control_prev, odom_pose
            )

            new_states = models.propagate(
                ctx, k_prop_s, particles.state, odom_pose, prev_pose
            )
            log_lik = models.log_weight(ctx, new_states, points, beam_mask)
            log_w = jnp.where(
                mask, particles.log_weight + log_lik, DEAD_LOG_WEIGHT
            )
            total = sharded_logsumexp(log_w, mask, axis)
            log_w = jnp.where(mask, log_w - total, DEAD_LOG_WEIGHT)

            avg_weight = 1.0 / jnp.maximum(active.astype(jnp.float32), 1.0)
            thrun, p_random = thrun_update(
                state.thrun, params.alpha_slow, params.alpha_fast, avg_weight
            )

            resample_count = jnp.mod(
                state.resample_count + 1, params.resample_interval
            )
            do_resample = resample_count == 0
            if params.selective_resampling:
                w_hat = jnp.where(mask, jnp.exp(log_w), 0.0)
                ess = 1.0 / jnp.maximum(
                    jax.lax.psum(jnp.sum(w_hat * w_hat), axis), 1e-38
                )
                do_resample &= ess < 0.5 * active.astype(jnp.float32)

            def do_resample_branch(args):
                log_w, thrun = args
                thrun2 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(p_random > 0.0, a, b),
                    ThrunState.init(), thrun,
                )
                w = jnp.where(mask, jnp.exp(log_w), 0.0)
                local_cdf, offset = sharded_cdf(w, axis)
                global_cdf = local_cdf + offset
                all_cdf = jax.lax.all_gather(global_cdf, axis).reshape(-1)

                def _search(cdf, u):
                    return jnp.clip(
                        jnp.searchsorted(cdf, u, side="right"), 0, n_total - 1
                    ).astype(jnp.int32)

                adaptive = params.min_particles < params.max_particles
                ranks = global_slots
                if adaptive and params.resampling != "multinomial":
                    # CDF-ordered strategies would hand the adaptive-KLD
                    # slot prefix only the low-CDF portion of the posterior
                    # (the same censoring fixed in filters/amcl.py); the
                    # interleave is free here — each slot just draws the
                    # position of a permuted RANK, donors come from the
                    # gathered global CDF either way.  Same stride as
                    # interleave_slots so fleet and mega paths carry
                    # identical prefix statistics.
                    from beluga_tpu.ops.resample import interleave_stride

                    r, g = interleave_stride(n_total)
                    ranks = (global_slots % g) * r + global_slots // g
                ranks_f = ranks.astype(jnp.float32)
                k_res_s = jax.random.fold_in(k_res, shard)

                if params.resampling == "multinomial":
                    # per-shard iid positions: the global multiset is iid
                    # multinomial (reference views/sample.hpp behavior)
                    u = jax.random.uniform(k_res_s, (n_local,), jnp.float32)
                    gidx = _search(all_cdf, u)
                elif params.resampling == "stratified":
                    u = (
                        ranks_f
                        + jax.random.uniform(k_res_s, (n_local,), jnp.float32)
                    ) / n_total
                    gidx = _search(all_cdf, u)
                elif params.resampling == "residual":
                    # deterministic floor(N·w) copies at global ranks < r0,
                    # iid multinomial draws over the residual CDF elsewhere
                    counts = jnp.floor(w * n_total)  # w globally normalized
                    local_cc = jnp.cumsum(counts)
                    cc_tot = local_cc[-1]
                    totals = jax.lax.all_gather(cc_tot, axis)
                    cc_off = jnp.sum(
                        jnp.where(jnp.arange(totals.shape[0]) < shard, totals, 0.0)
                    )
                    r0 = jnp.sum(totals)
                    all_cc = jax.lax.all_gather(local_cc + cc_off, axis).reshape(-1)
                    det_idx = _search(all_cc, ranks_f)
                    resid = jnp.where(mask, w * n_total - counts, 0.0)
                    rloc, roff = sharded_cdf(resid, axis)
                    all_rcdf = jax.lax.all_gather(rloc + roff, axis).reshape(-1)
                    u = jax.random.uniform(k_res_s, (n_local,), jnp.float32)
                    gidx = jnp.where(
                        ranks_f < r0, det_idx, _search(all_rcdf, u)
                    )
                else:  # systematic (the mega default)
                    u0 = jax.random.uniform(k_res, (), jnp.float32)  # same all shards
                    u = (ranks_f + u0) / n_total
                    gidx = _search(all_cdf, u)
                gathered = _all_gather_states(new_states, axis)
                donors = jax.tree_util.tree_map(
                    lambda leaf: jnp.take(leaf, gidx, axis=0), gathered
                )

                randoms = models.random_state(ctx, k_rand_s, n_local, None)
                inject = jax.random.bernoulli(k_mask_s, p_random, (n_local,))
                candidates = tree_where(inject, randoms, donors)

                hashes = models.hash_state(params, candidates)
                all_hashes = jax.lax.all_gather(hashes, axis).reshape(-1)
                k = distinct_prefix_count(all_hashes)
                count = jnp.arange(1, n_total + 1, dtype=jnp.float32)
                keep = (count <= params.min_particles) | (
                    count <= kld_target_size(k, params.kld_epsilon, params.kld_z)
                )
                any_stop = jnp.any(~keep)
                n_keep = jnp.where(any_stop, jnp.argmax(~keep), n_total)
                new_active = jnp.minimum(n_keep, n_total).astype(jnp.int32)
                new_log_w = jnp.where(
                    global_slots < new_active, 0.0, DEAD_LOG_WEIGHT
                ).astype(jnp.float32)
                return candidates, new_log_w, new_active, thrun2

            def skip_branch(args):
                log_w, thrun = args
                return new_states, log_w, active, thrun

            cand, out_log_w, out_active, thrun = jax.lax.cond(
                do_resample, do_resample_branch, skip_branch, (log_w, thrun)
            )

            out_mask = global_slots < out_active
            w_lin = jnp.where(out_mask, jnp.exp(out_log_w), 0.0)
            mean, cov = estimate_fn(cand, w_lin, axis)

            new_state = state._replace(
                particles=ParticleSet(cand, out_log_w, out_active),
                key=key,
                thrun=thrun,
                resample_count=resample_count,
                control_prev=odom_pose,
                control_seeded=jnp.asarray(True),
                force_update=jnp.asarray(False),
            )
            return new_state, Estimate(mean, cov, jnp.asarray(True))

        def skip(state):
            w = jnp.where(
                global_slots < state.particles.active,
                jnp.exp(state.particles.log_weight), 0.0,
            )
            mean, cov = estimate_fn(state.particles.state, w, axis)
            return state, Estimate(mean, cov, jnp.asarray(False))

        return jax.lax.cond(do_update, heavy, skip, state)

    particle_spec = P(axis)

    def update(ctx, state: AmclState, odom_pose, points, beam_mask):
        def spec_like(tree, spec):
            return jax.tree_util.tree_map(lambda _: spec, tree)

        in_state_spec = AmclState(
            particles=ParticleSet(
                state=spec_like(state.particles.state, particle_spec),
                log_weight=particle_spec,
                active=P(),
            ),
            key=P(),
            thrun=spec_like(state.thrun, P()),
            resample_count=P(),
            motion_latest=spec_like(state.motion_latest, P()),
            motion_seeded=P(),
            control_prev=spec_like(state.control_prev, P()),
            control_seeded=P(),
            force_update=P(),
        )
        est_spec = Estimate(
            pose=spec_like(odom_pose, P()),  # same pose pytree structure
            covariance=P(),
            valid=P(),
        )
        f = jax.shard_map(
            sharded_update,
            mesh=mesh,
            in_specs=(
                spec_like(ctx, P()),
                in_state_spec,
                spec_like(odom_pose, P()),
                P(),
                P(),
            ),
            out_specs=(in_state_spec, est_spec),
            check_vma=False,
        )
        return f(ctx, state, odom_pose, points, beam_mask)

    return update


def shard_mega_state(mesh: Mesh, state: AmclState, axis: str = "tp") -> AmclState:
    """Place a single filter's state onto the mesh (particles sharded)."""

    def put(tree, spec):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, NamedSharding(mesh, spec)), tree
        )

    return AmclState(
        particles=ParticleSet(
            state=put(state.particles.state, P(axis)),
            log_weight=put(state.particles.log_weight, P(axis)),
            active=put(state.particles.active, P()),
        ),
        key=put(state.key, P()),
        thrun=put(state.thrun, P()),
        resample_count=put(state.resample_count, P()),
        motion_latest=put(state.motion_latest, P()),
        motion_seeded=put(state.motion_seeded, P()),
        control_prev=put(state.control_prev, P()),
        control_seeded=put(state.control_seeded, P()),
        force_update=put(state.force_update, P()),
    )
