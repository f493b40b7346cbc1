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

    Returns ``update(ctx, state, odom_pose, points, beam_mask, *,
    sort_now=None) -> (state, Estimate)`` where the particle leaves of
    ``state`` are sharded ``P(axis)`` on ``mesh`` and everything else is
    replicated.  All four resampling strategies are supported: each shard
    draws the positions of its own output slots and searches them in the
    all-gathered global CDF (systematic/stratified ride shared/iid
    per-rank offsets, multinomial is per-shard iid, residual splits global
    ranks at the floor-copy count r0).  On TPU the CDF-ordered strategies
    route the search + donor copy through the fused Pallas kernel
    (ops/pallas_resample.py) against the gathered global state — the same
    kernel as the dense fast path, so a 1-device mesh reproduces its
    throughput.  Adaptive KLD interleaves the ranks of CDF-ordered
    strategies so the kept slot prefix is an unbiased subsample.

    ``sorted_slots`` (the winlut flagship contract) is supported via a
    shard-LOCAL theta sort: slot order is statistically irrelevant to the
    filter (filters/amcl.py:89-101) and the winlut kernel only needs
    *local* theta banding per lane tile, so no cross-shard sort exists —
    each shard orders its own slots by ``models.sort_key`` (strays-last
    theta key by default, computed from shard-local moments) on the same
    ``sort_interval`` schedule as the dense filter, with the same
    ``sort_now`` static override for scan drivers.  ``recovery_pool``
    splits the bounded injection pool evenly across shards.

    ``estimate_fn(states_local, weights_local, axis) -> (pose, cov)`` must
    reduce with collectives over ``axis``; the default is the SE2 estimate
    (pass an SE3 variant for 3D mega filters).
    """
    if estimate_fn is None:
        estimate_fn = _sharded_estimate_se2
    num_shards = mesh.shape[axis]
    n_total = params.max_particles
    assert n_total % num_shards == 0, "max_particles must divide the mesh axis"
    n_local = n_total // num_shards

    def sharded_update(ctx, state: AmclState, odom_pose, points, beam_mask,
                       sort_now: bool | None = None):
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

            if models.fused_propagate_reweight is not None:
                new_states, log_lik = models.fused_propagate_reweight(
                    ctx, k_prop_s, particles.state, odom_pose, prev_pose,
                    points, beam_mask,
                )
            else:
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

            # the counter cycles over resample_interval * sort_interval so
            # it drives BOTH gates (same schedule as filters/amcl.py):
            # resample at multiples of the interval, theta re-sort at every
            # sort_interval-th resample (count == 0)
            modulus = params.resample_interval * max(params.sort_interval, 1)
            resample_count = jnp.mod(state.resample_count + 1, modulus)
            do_resample = jnp.mod(resample_count, params.resample_interval) == 0
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
                fused = (
                    jax.default_backend() == "tpu"
                    and params.resampling in ("systematic", "stratified")
                )
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
                    from beluga_tpu.ops.resample import interleave_ranks

                    ranks = interleave_ranks(global_slots, n_total)
                ranks_f = ranks.astype(jnp.float32)
                k_res_s = jax.random.fold_in(k_res, shard)

                gidx = None
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
                    if not fused:
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
                    if not fused:
                        gidx = _search(all_cdf, u)
                gathered = _all_gather_states(new_states, axis)
                if gidx is None:
                    # fused Pallas CDF-search + donor copy against the
                    # gathered global state (bit-exact; the dense fast
                    # path's kernel, ops/pallas_resample.py) — positions
                    # are sorted within the shard for the CDF-ordered
                    # strategies, so block locality holds per shard.
                    # Adaptive ranks are interleaved (not sorted): sort
                    # the positions for the kernel and scatter back.
                    from beluga_tpu.ops.pallas_resample import (
                        resample_take_tree,
                    )

                    all_w = jax.lax.all_gather(w, axis).reshape(-1)
                    if adaptive:
                        order = jnp.argsort(u)
                        donors_s = resample_take_tree(
                            all_w, jnp.minimum(u[order], 1.0 - 2.0**-24),
                            gathered,
                        )
                        inv = jnp.argsort(order)
                        donors = jax.tree_util.tree_map(
                            lambda l: jnp.take(l, inv, axis=0), donors_s
                        )
                    else:
                        donors = resample_take_tree(
                            all_w, jnp.minimum(u, 1.0 - 2.0**-24), gathered
                        )
                else:
                    donors = jax.tree_util.tree_map(
                        lambda leaf: jnp.take(leaf, gidx, axis=0), gathered
                    )

                pool = params.recovery_pool
                pool_local = max(pool // num_shards, 8) if pool else 0
                if pool_local and pool_local < n_local:
                    # bounded-pool injection, split across shards: each
                    # shard draws its injected COUNT ~ Binomial(n_local, p)
                    # (clamped to its pool slice) and places its pool
                    # entries at iid uniform local slots — summed over
                    # shards this matches the dense bounded-pool semantics
                    # (filters/amcl.py recovery_pool)
                    randoms = models.random_state(ctx, k_rand_s, pool_local, None)
                    k_cnt, k_slot = jax.random.split(k_mask_s)
                    n_inj = jnp.minimum(
                        jax.random.binomial(k_cnt, n_local, p_random),
                        float(pool_local),
                    )
                    slots_r = jax.random.randint(
                        k_slot, (pool_local,), 0, n_local
                    )
                    valid = jnp.arange(pool_local) < n_inj
                    target = jnp.where(valid, slots_r, n_local)  # n_local -> dropped
                    from beluga_tpu.core.particles import tree_scatter

                    candidates = tree_scatter(donors, target, randoms)
                else:
                    randoms = models.random_state(ctx, k_rand_s, n_local, None)
                    inject = jax.random.bernoulli(
                        k_mask_s, p_random, (n_local,)
                    )
                    candidates = tree_where(inject, randoms, donors)

                if params.min_particles >= params.max_particles:
                    # fixed particle count: take_while_kld's `count <= min`
                    # clause keeps exactly max particles — skip the hash
                    # all_gather entirely (filters/amcl.py parity)
                    new_active = jnp.int32(n_total)
                else:
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

            if params.sorted_slots and sort_now is not False:
                # shard-LOCAL theta sort (winlut slab contract): slot order
                # is statistically irrelevant and the kernel only needs
                # local banding, so no cross-shard exchange is required.
                # The strays-last default key uses shard-local moments —
                # shards hold (stratified) subsamples of the same
                # posterior, so local and global moments agree to O(1/√n).
                # Dead slots sort last (inf keys), preserving the global
                # live-prefix invariant per shard (live counts per shard
                # are unchanged by a local permutation).
                from beluga_tpu.core.particles import tree_sort_by
                from beluga_tpu.filters.amcl import se2_sort_key

                key_fn = models.sort_key or se2_sort_key

                def do_sort(args):
                    cand, log_w = args
                    sort_keys = key_fn(cand)
                    sort_keys = jnp.where(
                        global_slots < out_active, sort_keys, jnp.inf
                    )
                    return tree_sort_by(sort_keys, (cand, log_w))

                if sort_now is True:
                    cand, out_log_w = do_sort((cand, out_log_w))
                elif (
                    params.sort_interval > 1
                    or params.selective_resampling
                    or params.resample_interval > 1
                ):
                    cand, out_log_w = jax.lax.cond(
                        resample_count == 0, do_sort, lambda a: a,
                        (cand, out_log_w),
                    )
                else:
                    cand, out_log_w = do_sort((cand, out_log_w))

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

    def update(ctx, state: AmclState, odom_pose, points, beam_mask, *,
               sort_now: bool | None = None):
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
        import functools

        f = jax.shard_map(
            functools.partial(sharded_update, sort_now=sort_now),
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
