"""Cluster-based SE2 estimation via parallel hill-climb label propagation.

TPU re-design of ``algorithm/cluster_based_estimation.hpp``: particles are
bucketed by spatial hash (x, y, θ at clustering resolution), per-cell
weights are mean-normalized and percentile-capped, cells are clustered by
climbing to their heaviest dominating neighbor, and the heaviest cluster's
weighted mean/covariance is returned.

The reference's priority-queue region growing (assign_clusters,
cluster_based_estimation.hpp:204-246) is replaced by the equivalent fixed
point computed in parallel:

  parent(c) = argmax_{n ∈ N6(c) ∪ {c}, dominates(n, c)} (weight(n), -rank(n))
  cluster(c) = root of the parent chain (pointer jumping, O(log N) rounds)

where ``dominates(n, c)`` means weight(n) > weight(c), or equal weight with a
better (lower) deterministic rank — the analog of the queue's
process-heaviest-first order; equal-weight plateaus created by the
percentile cap merge into one cluster exactly as the reference's inflated
re-queueing makes them.  Per-cluster mean/covariance use raw-moment segment
sums, reproducing estimation.hpp's SE2 estimate per cluster (including the
1/(1-Σw²) correction and circular yaw variance).

Single-particle clusters are excluded (cluster_based_estimation.hpp:383-390);
when no multi-particle cluster exists the plain estimate is returned
(cluster_based_estimation.hpp:423-426).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from beluga_tpu.algorithms.estimation import estimate_se2
from beluga_tpu.lie import SE2, SO2
from beluga_tpu.ops.spatial_hash import spatial_hash_se2

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ClusterizerParams:
    """Defaults from cluster_based_estimation.hpp:251-266."""

    linear_hash_resolution: float = 0.20
    angular_hash_resolution: float = 0.524
    weight_cap_percentile: float = 0.90


_SENTINEL = jnp.uint32(0xFFFFFFFF)


def _hash_lookup(sorted_hashes: Array, valid_count: Array, queries: Array) -> Array:
    """Map query hashes to indices into the sorted-unique-hash table (-1 if absent)."""
    idx = jnp.searchsorted(sorted_hashes, queries)
    idx = jnp.clip(idx, 0, sorted_hashes.shape[0] - 1)
    found = (sorted_hashes[idx] == queries) & (idx < valid_count)
    return jnp.where(found, idx, -1)


def cluster_based_estimate(
    states: SE2,
    weights: Array,
    mask: Array | None = None,
    params: ClusterizerParams = ClusterizerParams(),
    method: str = "auto",
):
    """Returns ``(SE2 mean, f32[3,3] cov)`` of the heaviest particle cluster.

    ``method``: ``"dense"`` (O(N²) equality-matrix compares + moment
    matmuls — no sort/unique/scatter/searchsorted, the TPU-friendly form
    at node/fleet particle counts), ``"sparse"`` (unique + segment sums,
    O(N log N) memory-lean — the mega-filter form), or ``"auto"``
    (dense for N ≤ 4096).  Both produce identical results (same
    deterministic tie-breaking; asserted by tests).
    """
    n = weights.shape[0]
    if method == "auto":
        method = "dense" if n <= 4096 else "sparse"
    if method == "dense":
        return _cluster_based_estimate_dense(states, weights, mask, params)
    if method != "sparse":
        raise ValueError(f"unknown method: {method!r}")
    if mask is None:
        mask = jnp.ones(n, bool)
    w = jnp.where(mask, weights.astype(jnp.float32), 0.0)

    theta = states.theta
    hashes = spatial_hash_se2(
        states.xy, theta, params.linear_hash_resolution, params.angular_hash_resolution
    )
    hashes = jnp.where(mask, hashes, _SENTINEL)

    # -- unique cells (make_cluster_map, hpp:139-158) ------------------------
    sorted_hashes, inv = jnp.unique(
        hashes, return_inverse=True, size=n, fill_value=_SENTINEL
    )
    num_cells = jnp.sum(sorted_hashes != _SENTINEL).astype(jnp.int32)
    cell_valid = jnp.arange(n) < num_cells

    cell_w = jax.ops.segment_sum(w, inv, num_segments=n)
    cell_count = jax.ops.segment_sum(mask.astype(jnp.int32), inv, num_segments=n)
    # representative state: first particle (input order) in each cell
    big = jnp.int32(n)
    rep_idx = jax.ops.segment_min(
        jnp.where(mask, jnp.arange(n, dtype=jnp.int32), big), inv, num_segments=n
    )
    rep_idx = jnp.clip(rep_idx, 0, n - 1)

    # -- normalize by count and cap at percentile (hpp:175-189) --------------
    cell_w = jnp.where(cell_valid, cell_w / jnp.maximum(cell_count, 1), 0.0)
    sortable = jnp.where(cell_valid, cell_w, jnp.inf)
    order = jnp.sort(sortable)
    k = (num_cells.astype(jnp.float32) * params.weight_cap_percentile).astype(jnp.int32)
    cap = order[jnp.clip(k, 0, n - 1)]
    cap = jnp.where(jnp.isfinite(cap), cap, jnp.inf)
    cell_w = jnp.minimum(cell_w, cap)

    # -- neighbor graph over the 6-neighborhood (hpp:279-283, 315-323) -------
    lin, ang = params.linear_hash_resolution, params.angular_hash_resolution
    offsets = jnp.asarray(
        [
            [lin, 0.0, 0.0],
            [-lin, 0.0, 0.0],
            [0.0, lin, 0.0],
            [0.0, -lin, 0.0],
            [0.0, 0.0, ang],
            [0.0, 0.0, -ang],
        ],
        jnp.float32,
    )
    rep_states = SE2(states.xy[rep_idx], SO2(states.rot.z[rep_idx]))
    # pose * SE2(offset_theta, offset_xy) for each of the 6 offsets
    off_xy = offsets[None, :, :2]  # [1, 6, 2]
    off_th = offsets[None, :, 2]
    c, s = rep_states.rot.cos[:, None], rep_states.rot.sin[:, None]
    nx = rep_states.x[:, None] + c * off_xy[..., 0] - s * off_xy[..., 1]
    ny = rep_states.y[:, None] + s * off_xy[..., 0] + c * off_xy[..., 1]
    nth = rep_states.theta[:, None] + off_th
    neigh_hash = spatial_hash_se2(
        jnp.stack([nx, ny], -1), SO2.exp(nth).log(), lin, ang
    )  # u32[n, 6]
    neigh_idx = _hash_lookup(sorted_hashes, num_cells, neigh_hash)  # [n, 6]

    # -- parallel hill climb (replaces assign_clusters, hpp:204-246) ---------
    rank = jnp.zeros(n, jnp.int32).at[jnp.argsort(-jnp.where(cell_valid, cell_w, -jnp.inf), stable=True)].set(
        jnp.arange(n, dtype=jnp.int32)
    )

    neigh_ok = neigh_idx >= 0
    safe_idx = jnp.clip(neigh_idx, 0, n - 1)
    nr = jnp.where(neigh_ok, rank[safe_idx], big)
    # rank is a total order on (desc weight, asc hash), so "dominates"
    # (higher weight, or equal weight with lower rank) is exactly
    # rank < self_rank, and the (weight, -rank)-argmax parent is exactly
    # the min-rank dominating neighbor — no float-epsilon key needed
    dominates = nr < rank[:, None]
    best = jnp.argmin(jnp.where(dominates, nr, big), axis=1)
    has_parent = jnp.any(dominates, axis=1)
    parent = jnp.where(
        has_parent, safe_idx[jnp.arange(n), best], jnp.arange(n, dtype=jnp.int32)
    )
    parent = jnp.where(cell_valid, parent, jnp.arange(n, dtype=jnp.int32))

    # pointer jumping to the root
    def jump(_, p):
        return p[p]

    iters = max(1, (max(n, 2) - 1).bit_length())
    root = jax.lax.fori_loop(0, iters, jump, parent)

    # -- per-cluster estimates via raw-moment segment sums (hpp:337-399) -----
    particle_cluster = root[inv]  # [N] cluster id = root cell index
    seg = jnp.where(mask, particle_cluster, n - 1)  # dead -> last segment (harmless)

    def ssum(v):
        return jax.ops.segment_sum(jnp.where(mask, v, 0.0), seg, num_segments=n)

    x, y = states.x, states.y
    cz = states.rot.cos
    sz = states.rot.sin
    W = ssum(w)
    Wx, Wy = ssum(w * x), ssum(w * y)
    Wc, Ws = ssum(w * cz), ssum(w * sz)
    Wxx, Wyy, Wxy = ssum(w * x * x), ssum(w * y * y), ssum(w * x * y)
    W2 = ssum(w * w)
    cnt = jax.ops.segment_sum(mask.astype(jnp.int32), seg, num_segments=n)

    eligible = (cnt > 1) & (jnp.arange(n) == root)  # roots only
    return _pick_cluster(
        W, Wx, Wy, Wc, Ws, Wxx, Wyy, Wxy, W2, eligible, states, weights, mask
    )


def _pick_cluster(W, Wx, Wy, Wc, Ws, Wxx, Wyy, Wxy, W2, eligible,
                  states, weights, mask):
    """Per-cluster raw moments → heaviest eligible cluster's SE2 estimate
    (estimation.hpp per cluster, incl. the 1/(1-Σw²) correction and
    circular yaw variance), with the plain-estimate fallback
    (cluster_based_estimation.hpp:423-426)."""
    Wsafe = jnp.maximum(W, 1e-38)
    mx, my = Wx / Wsafe, Wy / Wsafe
    mc, ms = Wc / Wsafe, Ws / Wsafe
    sq_sum = W2 / (Wsafe * Wsafe)  # sum of within-cluster normalized w^2
    corr = jnp.maximum(1.0 - sq_sum, 1e-9)
    cxx = (Wxx / Wsafe - mx * mx) / corr
    cyy = (Wyy / Wsafe - my * my) / corr
    cxy = (Wxy / Wsafe - mx * my) / corr
    norm = jnp.sqrt(mc * mc + ms * ms)
    yaw_var = jnp.where(norm < 1e-7, jnp.inf, -2.0 * jnp.log(jnp.maximum(norm, 1e-38)))

    any_eligible = jnp.any(eligible)
    best_cluster = jnp.argmax(jnp.where(eligible, W, -jnp.inf))

    mean = SE2(
        jnp.stack([mx[best_cluster], my[best_cluster]]),
        SO2(
            jnp.stack([mc[best_cluster], ms[best_cluster]])
            / jnp.maximum(norm[best_cluster], 1e-38)
        ),
    )
    cov = jnp.zeros((3, 3), jnp.float32)
    cov = cov.at[0, 0].set(cxx[best_cluster])
    cov = cov.at[1, 1].set(cyy[best_cluster])
    cov = cov.at[0, 1].set(cxy[best_cluster])
    cov = cov.at[1, 0].set(cxy[best_cluster])
    cov = cov.at[2, 2].set(yaw_var[best_cluster])

    # fallback: plain estimate when no multi-particle cluster exists
    fb_mean, fb_cov = estimate_se2(states, weights, mask)

    pick = lambda a, b: jax.tree_util.tree_map(
        lambda u, v: jnp.where(any_eligible, u, v), a, b
    )
    return pick(mean, fb_mean), pick(cov, fb_cov)


def _cluster_based_estimate_dense(
    states: SE2,
    weights: Array,
    mask: Array | None,
    params: ClusterizerParams,
):
    """O(N²) form of the clusterizer: every unique/segment_sum/searchsorted
    of the sparse path becomes an equality-matrix compare-reduce (VPU) —
    no sorts except the N-length percentile sort, no scatters, no
    serialized gathers (index applications ride one-hot reductions).
    Cell identity = the cell's first particle (input order), matching the
    sparse path's representative choice; ranks tie-break by ascending
    hash, matching the sparse path's sorted-hash cell order."""
    n = weights.shape[0]
    if mask is None:
        mask = jnp.ones(n, bool)
    w = jnp.where(mask, weights.astype(jnp.float32), 0.0)
    iota = jnp.arange(n, dtype=jnp.int32)

    h = spatial_hash_se2(
        states.xy, states.theta,
        params.linear_hash_resolution, params.angular_hash_resolution,
    )
    h = jnp.where(mask, h, _SENTINEL)

    # -- cells: same-hash equality over alive particles ----------------------
    alive2 = mask[:, None] & mask[None, :]
    eq = (h[:, None] == h[None, :]) & alive2  # [N, N]
    rep = jnp.min(jnp.where(eq, iota[None, :], n), axis=1).astype(jnp.int32)
    rep = jnp.where(mask, rep, iota)
    is_rep = mask & (rep == iota)
    eqf = eq.astype(jnp.float32)
    cell_cnt = jnp.sum(eqf, axis=1)
    cell_w = jnp.sum(jnp.where(eq, w[None, :], 0.0), axis=1) / jnp.maximum(
        cell_cnt, 1.0
    )  # mean weight, carried at every member (hpp:175-189)

    # -- percentile cap ------------------------------------------------------
    num_cells = jnp.sum(is_rep.astype(jnp.int32))
    order = jnp.sort(jnp.where(is_rep, cell_w, jnp.inf))
    k = (num_cells.astype(jnp.float32) * params.weight_cap_percentile).astype(
        jnp.int32
    )
    cap = order[jnp.clip(k, 0, n - 1)]
    cap = jnp.where(jnp.isfinite(cap), cap, jnp.inf)
    cell_w = jnp.minimum(cell_w, cap)

    # -- rank: #cells dominating (desc weight, asc hash — the sparse path's
    # stable argsort order over hash-sorted cells) ---------------------------
    dom = is_rep[None, :] & (
        (cell_w[None, :] > cell_w[:, None])
        | ((cell_w[None, :] == cell_w[:, None]) & (h[None, :] < h[:, None]))
    )
    rank = jnp.sum(dom, axis=1).astype(jnp.int32)

    # -- neighbor parents over the 6-neighborhood ----------------------------
    # representative state per particle, via one-hot reduction (no gather)
    oh_rep = rep[:, None] == iota[None, :]  # [N, N]

    def take_rep(v):
        return jnp.sum(jnp.where(oh_rep, v[None, :], 0.0), axis=1)

    rx, ry = take_rep(states.x), take_rep(states.y)
    rc, rs = take_rep(states.rot.cos), take_rep(states.rot.sin)

    lin, ang = params.linear_hash_resolution, params.angular_hash_resolution
    offsets = jnp.asarray(
        [
            [lin, 0.0, 0.0],
            [-lin, 0.0, 0.0],
            [0.0, lin, 0.0],
            [0.0, -lin, 0.0],
            [0.0, 0.0, ang],
            [0.0, 0.0, -ang],
        ],
        jnp.float32,
    )
    big = jnp.int32(n)
    best_nr = jnp.full(n, big)
    best_idx = iota
    rep_theta = jnp.arctan2(rs, rc)
    for k6 in range(6):
        ox, oy, oth = offsets[k6, 0], offsets[k6, 1], offsets[k6, 2]
        nx = rx + rc * ox - rs * oy
        ny = ry + rs * ox + rc * oy
        nth = SO2.exp(rep_theta + oth).log()
        nh = spatial_hash_se2(jnp.stack([nx, ny], -1), nth, lin, ang)  # [N]
        m = is_rep[None, :] & (h[None, :] == nh[:, None])  # [N, N], ≤1 true/row
        valid = jnp.any(m, axis=1)
        nr = jnp.sum(jnp.where(m, rank[None, :], 0), axis=1)
        nidx = jnp.sum(jnp.where(m, iota[None, :], 0), axis=1).astype(jnp.int32)
        nr = jnp.where(valid, nr, big)
        # rank totally orders (desc weight, asc hash): dominance is
        # rank < self_rank, best parent is the min-rank dominator
        dominates = nr < rank
        better = dominates & (nr < best_nr)
        best_nr = jnp.where(better, nr, best_nr)
        best_idx = jnp.where(better, nidx, best_idx)
    parent = jnp.where(is_rep & (best_nr < rank), best_idx, iota)

    # -- pointer jumping via one-hot reduction (p <- p[p]) -------------------
    def jump(_, p):
        oh = p[:, None] == iota[None, :]
        return jnp.sum(jnp.where(oh, p[None, :], 0), axis=1).astype(jnp.int32)

    iters = max(1, (max(n, 2) - 1).bit_length())
    root = jax.lax.fori_loop(0, iters, jump, parent)

    # -- per-particle root, then per-cluster raw moments ---------------------
    root_p = jnp.sum(jnp.where(oh_rep, root[None, :], 0), axis=1).astype(jnp.int32)
    memb = (root_p[None, :] == iota[:, None]) & mask[None, :]  # [N(root), N(part)]

    x, y = states.x, states.y
    cz, sz = states.rot.cos, states.rot.sin
    cols = jnp.stack(
        [w, w * x, w * y, w * cz, w * sz, w * x * x, w * y * y, w * x * y,
         w * w, mask.astype(jnp.float32)],
        axis=-1,
    )  # [N, 10]
    sums = jax.lax.dot(
        memb.astype(jnp.float32), cols,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [N, 10] per-cluster raw moments
    W, Wx, Wy, Wc, Ws, Wxx, Wyy, Wxy, W2, cnt = (sums[:, i] for i in range(10))

    eligible = (cnt > 1.5) & mask & (root_p == iota)  # roots only
    return _pick_cluster(
        W, Wx, Wy, Wc, Ws, Wxx, Wyy, Wxy, W2, eligible, states, weights, mask
    )
