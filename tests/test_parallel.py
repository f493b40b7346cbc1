"""Fleet batching (vmap) and mesh sharding tests on the virtual CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from beluga_tpu.core.random import sample_normal_se2
from beluga_tpu.filters.amcl import AmclParams, init_state, update
from beluga_tpu.filters.builders import make_likelihood_field_filter
from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.parallel.fleet import (
    fleet_state_sharding,
    make_fleet_update,
    replicate,
    shard_fleet,
)


def small_world():
    data = np.zeros((60, 60), np.int8)
    data[0, :] = data[-1, :] = OCCUPIED_VALUE
    data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[25:30, 25:30] = OCCUPIED_VALUE
    return make_grid(data, 0.1)


def make_batch_state(params, batch, key=0):
    grid = small_world()
    models, ctx = make_likelihood_field_filter(grid)

    def one(key):
        k1, k2 = jax.random.split(key)
        states = sample_normal_se2(
            k1, params.max_particles, SE2.from_xytheta(3.0, 3.0, 0.0), jnp.eye(3) * 0.2
        )
        return init_state(k2, states, params)

    keys = jax.random.split(jax.random.PRNGKey(key), batch)
    state = jax.vmap(one)(keys)
    return grid, models, ctx, state


def fake_scan(batch, n_beams=20):
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (batch, n_beams, 2)).astype(np.float32)
    mask = np.ones((batch, n_beams), bool)
    return jnp.asarray(pts), jnp.asarray(mask)


class TestFleet:
    def test_vmapped_fleet_update(self):
        params = AmclParams(max_particles=256, min_particles=64)
        grid, models, ctx, state = make_batch_state(params, batch=4)
        fleet_update = make_fleet_update(params, models)
        pts, mask = fake_scan(4)
        odoms = SE2.identity((4,))
        new_state, est = jax.jit(fleet_update)(ctx, state, odoms, pts, mask)
        assert est.valid.shape == (4,)
        assert bool(est.valid.all())
        assert np.isfinite(np.asarray(est.pose.xy)).all()
        assert new_state.particles.log_weight.shape == (4, 256)

    def test_fleet_filters_independent(self):
        # different PRNG keys produce different particle clouds per filter
        params = AmclParams(max_particles=128, min_particles=32)
        grid, models, ctx, state = make_batch_state(params, batch=3)
        fleet_update = make_fleet_update(params, models)
        pts, mask = fake_scan(3)
        odoms = SE2.from_xytheta(
            jnp.asarray([0.3, 0.0, -0.3]), jnp.zeros(3), jnp.zeros(3)
        )
        _, est = jax.jit(fleet_update)(ctx, state, odoms, pts, mask)
        xs = np.asarray(est.pose.x)
        assert len(np.unique(np.round(xs, 4))) > 1

    def test_sharded_fleet_on_mesh(self):
        devices = jax.devices()
        assert len(devices) == 8, "conftest should provide 8 virtual devices"
        mesh = Mesh(np.asarray(devices).reshape(2, 4), ("dp", "tp"))

        params = AmclParams(max_particles=128, min_particles=32)
        grid, models, ctx, state = make_batch_state(params, batch=2)
        state = shard_fleet(mesh, state)
        ctx = replicate(mesh, ctx)

        fleet_update = make_fleet_update(params, models)
        pts, mask = fake_scan(2)
        odoms = SE2.identity((2,))

        out_shardings = (
            fleet_state_sharding(mesh, state),
            None,
        )
        step = jax.jit(fleet_update, out_shardings=out_shardings)
        new_state, est = step(ctx, state, odoms, pts, mask)
        assert bool(est.valid.all())
        # particle leaves really live sharded over (dp, tp)
        lw = new_state.particles.log_weight
        assert lw.sharding.spec == P("dp", "tp")
        assert np.isfinite(np.asarray(est.pose.xy)).all()

    def test_sharded_matches_single_device(self):
        # same keys, same inputs: sharded execution must be numerically
        # equivalent to unsharded execution
        devices = jax.devices()
        mesh = Mesh(np.asarray(devices).reshape(2, 4), ("dp", "tp"))
        params = AmclParams(max_particles=64, min_particles=16)
        grid, models, ctx, state = make_batch_state(params, batch=2)
        pts, mask = fake_scan(2)
        odoms = SE2.identity((2,))
        fleet_update = make_fleet_update(params, models)

        _, est_plain = jax.jit(fleet_update)(ctx, state, odoms, pts, mask)

        sstate = shard_fleet(mesh, state)
        sctx = replicate(mesh, ctx)
        _, est_shard = jax.jit(fleet_update)(sctx, sstate, odoms, pts, mask)

        np.testing.assert_allclose(
            np.asarray(est_plain.pose.xy), np.asarray(est_shard.pose.xy), atol=2e-4
        )


class TestPallasResample:
    """Fused resample+copy kernel (ops/pallas_resample.py, interpret mode)."""

    def test_matches_searchsorted_take(self):
        from beluga_tpu.ops.pallas_resample import resample_take
        rng = np.random.default_rng(0)
        n, m, d = 1000, 700, 4   # non-multiples exercise padding
        w = rng.random(n).astype(np.float32)
        w[800:] = 0.0
        u = rng.random(m).astype(np.float32)
        vals = (rng.standard_normal((d, n)) * 10).astype(np.float32)
        got = resample_take(jnp.asarray(w), jnp.asarray(u), jnp.asarray(vals),
                            interpret=True)
        cdf = np.cumsum(w) / w.sum()
        idx = np.clip(np.searchsorted(cdf, u, side="right"), 0, n - 1)
        np.testing.assert_array_equal(np.asarray(got), vals[:, idx].T)

    def test_huge_path_matches_vmem_kernel(self, monkeypatch):
        """The HBM-resident value-plane variant (particle counts whose
        [3D, N] table exceeds VMEM) is bit-exact with the VMEM kernel;
        forced here via a tiny threshold.  (The oracle is the kernel
        itself, not numpy searchsorted: the backend's f32 cumsum can
        differ from numpy's by 1 ulp at scan boundaries, legitimately
        shifting a handful of donors.)"""
        import beluga_tpu.ops.pallas_resample as pr

        rng = np.random.default_rng(3)
        n, m, d = 6144, 3000, 4  # > 2*_NBLK so the big-N path is taken
        w = rng.random(n).astype(np.float32)
        w[5000:] = 0.0
        u = np.sort(rng.random(m).astype(np.float32))
        args = (jnp.asarray(w), jnp.asarray(u),
                jnp.asarray((rng.standard_normal((d, n)) * 10)
                            .astype(np.float32)))
        ref = np.asarray(pr.resample_take(*args, interpret=True))
        monkeypatch.setattr(pr, "_VMEM_VALS_LIMIT", 1 << 10)
        jax.clear_caches()  # drop the traced non-huge variant
        got = np.asarray(pr.resample_take(*args, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def test_tree_roundtrip_and_vmap(self):
        from beluga_tpu.lie import SE2
        from beluga_tpu.ops.pallas_resample import resample_take_tree
        rng = np.random.default_rng(1)
        b, n = 3, 512
        w = jnp.asarray(rng.random((b, n)), jnp.float32)
        u = jnp.asarray(rng.random((b, n)), jnp.float32)
        states = SE2.from_xytheta(
            jnp.asarray(rng.standard_normal((b, n)), jnp.float32),
            jnp.asarray(rng.standard_normal((b, n)), jnp.float32),
            jnp.asarray(rng.uniform(-3, 3, (b, n)), jnp.float32),
        )
        f = jax.vmap(lambda w, u, s: resample_take_tree(w, u, s, interpret=True))
        out = f(w, u, states)
        # every output state is an exact copy of some input state
        for bi in range(b):
            # oracle cdf must use XLA's cumsum (numpy's pairwise summation
            # rounds differently and flips exact-boundary picks)
            c = jnp.cumsum(w[bi])
            cdf = np.asarray(c / jnp.maximum(c[-1], 1e-38))
            idx = np.clip(np.searchsorted(cdf, np.asarray(u[bi]), "right"), 0, n - 1)
            np.testing.assert_array_equal(np.asarray(out.x[bi]), np.asarray(states.x[bi])[idx])
            np.testing.assert_array_equal(
                np.asarray(out.rot.cos[bi]), np.asarray(states.rot.cos[bi])[idx])

    def test_blocked_kernel_path_large_n(self):
        """n > 2 * _NBLK exercises the particle-axis-blocked kernel with the
        CDF block-range restriction (the mega-filter path)."""
        from beluga_tpu.ops import pallas_resample as pr

        rng = np.random.default_rng(3)
        n, m, d = 3 * pr._NBLK + 77, 600, 3  # odd sizes exercise padding
        w = rng.random(n).astype(np.float32)
        w[n - 500:] = 0.0
        u = np.sort(rng.random(m).astype(np.float32))  # sorted = systematic-like
        vals = (rng.standard_normal((d, n)) * 5).astype(np.float32)
        got = pr.resample_take(jnp.asarray(w), jnp.asarray(u), jnp.asarray(vals),
                               interpret=True)
        c = jnp.cumsum(jnp.asarray(w))
        cdf = np.asarray(c / jnp.maximum(c[-1], 1e-38))
        idx = np.clip(np.searchsorted(cdf, u, side="right"), 0, n - 1)
        np.testing.assert_array_equal(np.asarray(got), vals[:, idx].T)

    def test_split3_reconstruction_exact(self):
        """Truncation split: hi + mid + lo == x bit-for-bit (the round-trip
        residual form is elided to zero under --xla_allow_excess_precision)."""
        from beluga_tpu.ops.pallas_resample import _split3

        rng = np.random.default_rng(11)
        x = jnp.asarray(
            np.concatenate([
                rng.standard_normal(500) * 1e4,
                rng.standard_normal(500) * 1e-4,
                np.arange(261630, 262144, dtype=np.float64),
                [0.0, -0.0, 1.0, -262143.0],
            ]).astype(np.float32)
        )[None, :]
        planes = np.asarray(_split3(x), np.float32)
        d = x.shape[0]
        recon = planes[:d] + planes[d : 2 * d] + planes[2 * d :]
        np.testing.assert_array_equal(recon, np.asarray(x))

    def test_sorted_multinomial_positions_distribution(self):
        """Exponential-spacings order statistics: sorted, in (0,1), and the
        empirical CDF matches U(0,1) (KS distance ~ 1/sqrt(n))."""
        from beluga_tpu.ops.resample import sorted_multinomial_positions

        n = 20000
        u = np.asarray(sorted_multinomial_positions(jax.random.PRNGKey(0), n))
        assert u.shape == (n,)
        assert (np.diff(u) >= 0).all()
        assert u[0] >= 0.0 and u[-1] < 1.0
        ks = np.max(np.abs(u - (np.arange(1, n + 1) - 0.5) / n))
        assert ks < 3.0 / np.sqrt(n), f"KS distance {ks:.4f}"

    def test_interleave_slots_is_permutation(self):
        from beluga_tpu.ops.resample import interleave_slots

        x = jnp.arange(1000, dtype=jnp.int32)
        y = np.asarray(interleave_slots(x))
        assert sorted(y.tolist()) == list(range(1000))
        # consecutive output slots come from distant input ranks
        assert np.median(np.abs(np.diff(y))) > 1

    def test_multinomial_tree_counts_match_weights(self):
        """The fast multinomial path produces donor counts ~ Multinomial(M, w)
        and a slot order whose prefix spans the CDF."""
        from beluga_tpu.ops.pallas_resample import resample_take_tree_multinomial

        rng = np.random.default_rng(5)
        n = 4096
        w = rng.random(n).astype(np.float32)
        w[n // 2 :] = 0.0  # dead tail never selected
        # state plane = the particle index so donors are identifiable
        states = {"idx": jnp.arange(n, dtype=jnp.float32)}
        out = resample_take_tree_multinomial(
            jax.random.PRNGKey(3), jnp.asarray(w), states, n, interpret=True
        )
        donor = np.asarray(out["idx"]).astype(int)
        assert (donor < n // 2).all()
        counts = np.bincount(donor, minlength=n)
        p = w / w.sum()
        # chi-square-style moment check on aggregate bins
        bins = counts.reshape(64, -1).sum(1)
        expect = p.reshape(64, -1).sum(1) * n
        z = (bins - expect) / np.sqrt(np.maximum(expect, 1e-9))
        assert np.abs(z).max() < 5.0, z
        # prefix covers the CDF: the first 256 slots span most weight deciles
        prefix_cdf = np.cumsum(p)[donor[:256]]
        assert prefix_cdf.min() < 0.1 and prefix_cdf.max() > 0.85

    def test_blocked_kernel_unsorted_positions(self):
        from beluga_tpu.ops import pallas_resample as pr

        rng = np.random.default_rng(4)
        n, m = 2 * pr._NBLK + 1, 512
        w = rng.random(n).astype(np.float32)
        u = rng.random(m).astype(np.float32)  # unsorted (multinomial-like)
        vals = rng.standard_normal((1, n)).astype(np.float32)
        got = pr.resample_take(jnp.asarray(w), jnp.asarray(u), jnp.asarray(vals),
                               interpret=True)
        c = jnp.cumsum(jnp.asarray(w))
        cdf = np.asarray(c / jnp.maximum(c[-1], 1e-38))
        idx = np.clip(np.searchsorted(cdf, u, side="right"), 0, n - 1)
        np.testing.assert_array_equal(np.asarray(got), vals[:, idx].T)


def test_residual_resampling_kernel_construction():
    """The fused-kernel residual path (filters/amcl.py TPU branch):
    stratified positions (j+0.5)/R0 over the floor-count CDF produce
    EXACTLY floor(M*w_i) deterministic copies of each particle, and the
    residual slots j >= r0 carry exactly m - r0 multinomial draws from
    the residual distribution (sorted_residual_multinomial_positions)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from beluga_tpu.ops.pallas_resample import resample_take_tree
    from beluga_tpu.ops.resample import sorted_residual_multinomial_positions

    rng = np.random.default_rng(0)
    n = m = 512
    w = rng.exponential(1.0, n).astype(np.float32)
    wn = w / w.sum()
    counts = np.floor(wn * m)
    r0 = int(counts.sum())
    assert 0 < r0 < m

    state = jnp.asarray(np.arange(n, dtype=np.float32))  # identity payload
    slots = jnp.arange(m, dtype=jnp.float32)
    u_det = jnp.where(slots < r0, (slots + 0.5) / max(r0, 1), 1.5)
    det = np.asarray(resample_take_tree(
        jnp.asarray(counts, jnp.float32), u_det, state, interpret=True))
    # exactly floor(M w_i) copies of particle i among the first r0 slots
    got = np.bincount(det[:r0].astype(int), minlength=n)
    np.testing.assert_array_equal(got, counts.astype(int))

    u_res = sorted_residual_multinomial_positions(
        jax.random.PRNGKey(1), jnp.float32(r0), m)
    ur = np.asarray(u_res)
    # zeros on the deterministic prefix, sorted live tail in [0, 1)
    np.testing.assert_array_equal(ur[:r0], 0.0)
    assert np.all(np.diff(ur[r0:]) >= 0) and ur[-1] < 1.0
    res = np.asarray(resample_take_tree(
        jnp.asarray(wn * m - counts, jnp.float32), u_res, state,
        interpret=True))
    combined = np.concatenate([det[:r0], res[r0:]]).astype(int)
    assert combined.shape[0] == m
    # every particle appears at least its deterministic count
    total = np.bincount(combined, minlength=n)
    assert np.all(total >= counts.astype(int))

    # statistical check: residual-slot donor frequencies match the residual
    # distribution (chi-square-ish bound over 64 key replicates)
    resid = wn * m - counts
    p = resid / resid.sum()
    freq = np.zeros(n)
    reps = 64
    for s in range(reps):
        u_s = sorted_residual_multinomial_positions(
            jax.random.PRNGKey(100 + s), jnp.float32(r0), m)
        d = np.asarray(resample_take_tree(
            jnp.asarray(resid, jnp.float32), u_s, state, interpret=True))
        freq += np.bincount(d[r0:].astype(int), minlength=n)
    draws = reps * (m - r0)
    z = (freq - draws * p) / np.sqrt(np.maximum(draws * p * (1 - p), 1e-9))
    assert np.abs(z).max() < 5.0


def test_sorted_residual_positions_edge_cases():
    """r0 = 0 reduces to plain sorted order statistics; r0 = m leaves no
    live positions (all zeros)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from beluga_tpu.ops.resample import sorted_residual_multinomial_positions

    m = 256
    u0 = np.asarray(sorted_residual_multinomial_positions(
        jax.random.PRNGKey(0), jnp.float32(0.0), m))
    assert np.all(np.diff(u0) >= 0) and u0[0] >= 0 and u0[-1] < 1.0
    # mean of all order statistics together ~ 1/2
    assert abs(u0.mean() - 0.5) < 0.06
    um = np.asarray(sorted_residual_multinomial_positions(
        jax.random.PRNGKey(1), jnp.float32(m), m))
    np.testing.assert_array_equal(um, 0.0)


def test_resample_take_huge_path_interpret(monkeypatch):
    """The HBM-resident huge path (vals + CDF DMA'd per block) matches the
    VMEM path exactly; exercised by forcing the size threshold down."""
    import jax.numpy as jnp
    import numpy as np

    from beluga_tpu.ops import pallas_resample as pr

    rng = np.random.default_rng(7)
    n, m, d = 4 * pr._NBLK, 512, 3
    w = rng.random(n).astype(np.float32)
    u = np.sort(rng.random(m).astype(np.float32))
    vals = (rng.standard_normal((d, n)) * 5).astype(np.float32)
    args = (jnp.asarray(w), jnp.asarray(u), jnp.asarray(vals))
    want = np.asarray(pr.resample_take(*args, interpret=True))
    monkeypatch.setattr(pr, "_VMEM_VALS_LIMIT", 1)
    got = np.asarray(
        pr.resample_take(*args, interpret=True, chunk=256, nblk=128)
    )
    c = jnp.cumsum(jnp.asarray(w))
    cdf = np.asarray(c / jnp.maximum(c[-1], 1e-38))
    idx = np.clip(np.searchsorted(cdf, u, side="right"), 0, n - 1)
    np.testing.assert_array_equal(got, vals[:, idx].T)
    np.testing.assert_array_equal(want[: len(got)], got[: len(want)])


def test_positions_strictly_below_one():
    """All POSITIONERS keep u < 1.0 even when f32 rounding would hit 1.0
    (code-review r4: (num-1+u0)/num rounds to exactly 1.0 at mega counts
    with P ~ num * 2^-25 per draw, and the fused kernel's interval mask
    would then select NO donor — an all-zero particle state)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from beluga_tpu.ops import resample as rs

    num = 2_097_152
    # the raw formula really does round to 1.0 at the worst-case offset
    worst = np.float32(num - 1 + np.float32(1.0 - 1e-8)) / np.float32(num)
    assert worst == np.float32(1.0)
    # adversarial u0 ~ 1: force the rounding case deterministically
    for fn in (rs.systematic_positions, rs.stratified_positions):
        orig = jax.random.uniform
        try:
            jax.random.uniform = lambda key, shape=(), *a, **k: jnp.full(
                shape, 1.0 - 1e-8, jnp.float32
            )
            with jax.disable_jit():
                u = np.asarray(fn(jax.random.PRNGKey(0), num))
        finally:
            jax.random.uniform = orig
        assert u.max() < 1.0, fn.__name__


def test_pointcloud2_fallback_bounds(monkeypatch):
    """The pure-python PointCloud2 fallback rejects layouts whose strides
    would read past the payload (code-review r4: as_strided does no
    bounds checking)."""
    import numpy as np
    import pytest

    from beluga_tpu.io import native
    from tests.test_rosbag import encode_pointcloud2

    monkeypatch.setattr(native, "_load", lambda: None)
    pts = np.ones((4, 3), np.float32)
    good = encode_pointcloud2(pts)
    np.testing.assert_array_equal(native.decode_pointcloud2_cdr(good), pts)
    # corrupt the z field offset beyond point_step: locate the offset u32
    # of field "z" (name "z\x00" followed by aligned offset)
    blob = bytearray(good)
    at = blob.find(b"z\x00")
    assert at > 0
    off_pos = at + 2
    off_pos += (-(off_pos - 4)) % 4  # CDR align 4 rel. to byte 4
    import struct

    struct.pack_into("<I", blob, off_pos, 4000)
    with pytest.raises(ValueError):
        native.decode_pointcloud2_cdr(bytes(blob))


def test_resample_take_huge_path_weight_concentration(monkeypatch):
    """r5 fixed-span DMA granules: a chunk whose donor span exceeds one
    granule (heavy weight concentration — most donors zero-weight) still
    selects every donor exactly once (the per-block predicates mask
    granule-window overlap from the clamped DMA starts)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from beluga_tpu.ops import pallas_resample as pr

    rng = np.random.default_rng(11)
    n, m, d = 16 * pr._NBLK, 1024, 3
    # a handful of massive donors scattered across blocks; everything else
    # carries a tiny weight so position chunks span MANY blocks
    w = np.full(n, 1e-7, np.float32)
    heavy = rng.choice(n, 12, replace=False)
    w[heavy] = rng.random(12).astype(np.float32) + 0.5
    u = np.sort(rng.random(m).astype(np.float32))
    vals = (rng.standard_normal((d, n)) * 5).astype(np.float32)
    args = (jnp.asarray(w), jnp.asarray(u), jnp.asarray(vals))
    monkeypatch.setattr(pr, "_VMEM_VALS_LIMIT", 1)
    jax.clear_caches()
    got = np.asarray(
        pr.resample_take(*args, interpret=True, chunk=256, nblk=128)
    )
    c = jnp.cumsum(jnp.asarray(w))
    cdf = np.asarray(jax.lax.cummax(c / jnp.maximum(c[-1], 1e-38)))
    idx = np.clip(np.searchsorted(cdf, u, side="right"), 0, n - 1)
    np.testing.assert_array_equal(got, vals[:, idx].T)
