"""Unit tests for particle storage, weights, resampling, KLD, hashing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.core.particles import make_from_states, tree_take, tree_where
from beluga_tpu.core.weights import effective_sample_size, normalize, normalized_weights
from beluga_tpu.lie import SE2
from beluga_tpu.algorithms.kld import distinct_prefix_count, kld_active_count, kld_target_size
from beluga_tpu.algorithms.thrun import ThrunState, thrun_update
from beluga_tpu.ops.resample import (
    multinomial_indices,
    residual_indices,
    stratified_indices,
    systematic_indices,
)
from beluga_tpu.ops.spatial_hash import spatial_hash_se2


class TestParticleSet:
    def test_make_from_states_unit_weights(self):
        states = jnp.arange(10.0)
        p = make_from_states(states)
        np.testing.assert_allclose(p.weight, np.ones(10))
        assert int(p.active) == 10

    def test_active_masking(self):
        p = make_from_states(jnp.arange(10.0), active=4)
        np.testing.assert_allclose(p.weight, [1] * 4 + [0] * 6)
        np.testing.assert_array_equal(p.mask, [True] * 4 + [False] * 6)

    def test_normalize(self):
        p = make_from_states(jnp.arange(8.0), active=4)
        p = p.replace(log_weight=jnp.log(jnp.asarray([1.0, 2, 3, 4, 99, 99, 99, 99])))
        n = normalize(p)
        np.testing.assert_allclose(n.weight[:4], np.array([1, 2, 3, 4]) / 10.0, rtol=1e-6)
        np.testing.assert_allclose(n.weight[4:], 0.0)

    def test_ess_uniform(self):
        # ESS of n equal weights is n (effective_sample_size.hpp:46)
        p = make_from_states(jnp.arange(16.0), active=10)
        np.testing.assert_allclose(effective_sample_size(p), 10.0, rtol=1e-5)

    def test_ess_degenerate(self):
        p = make_from_states(jnp.arange(4.0))
        p = p.replace(log_weight=jnp.asarray([0.0, -100.0, -100.0, -100.0]))
        np.testing.assert_allclose(effective_sample_size(p), 1.0, rtol=1e-4)


class TestResampling:
    def _weights(self):
        w = np.zeros(100, np.float32)
        w[10] = 0.5
        w[20] = 0.3
        w[30] = 0.2
        return jnp.asarray(w)

    @pytest.mark.parametrize(
        "fn", [multinomial_indices, systematic_indices, stratified_indices, residual_indices]
    )
    def test_frequencies_match_weights(self, fn):
        key = jax.random.PRNGKey(0)
        idx = np.asarray(fn(key, self._weights(), 10000))
        counts = np.bincount(idx, minlength=100) / 10000.0
        np.testing.assert_allclose(counts[10], 0.5, atol=0.03)
        np.testing.assert_allclose(counts[20], 0.3, atol=0.03)
        np.testing.assert_allclose(counts[30], 0.2, atol=0.03)
        assert counts[[10, 20, 30]].sum() == 1.0  # nothing else ever selected

    def test_systematic_low_variance(self):
        # systematic with uniform weights reproduces every index exactly once
        key = jax.random.PRNGKey(1)
        w = jnp.ones(64)
        idx = np.asarray(systematic_indices(key, w, 64))
        assert sorted(idx.tolist()) == list(range(64))

    def test_residual_deterministic_part(self):
        # weight 0.5 over 100 draws -> at least floor(50) copies guaranteed
        key = jax.random.PRNGKey(2)
        idx = np.asarray(residual_indices(key, self._weights(), 100))
        counts = np.bincount(idx, minlength=100)
        assert counts[10] >= 50
        assert counts[20] >= 30
        assert counts[30] >= 20


class TestSpatialHash:
    def test_same_bucket_same_hash(self):
        xy = jnp.asarray([[0.1, 0.1], [0.3, 0.4], [1.2, 0.1]])
        theta = jnp.asarray([0.05, 0.08, 0.05])
        h = np.asarray(spatial_hash_se2(xy, theta, 0.5, 0.5))
        assert h[0] == h[1]  # same 0.5m x 0.5m x 0.5rad bucket
        assert h[0] != h[2]

    def test_negative_coordinates_floor(self):
        # floor semantics: -0.1 and +0.1 are different cells
        xy = jnp.asarray([[-0.1, 0.0], [0.1, 0.0]])
        theta = jnp.zeros(2)
        h = np.asarray(spatial_hash_se2(xy, theta, 0.5, 0.5))
        assert h[0] != h[1]


class TestKld:
    def test_distinct_prefix_count(self):
        h = jnp.asarray([5, 5, 3, 5, 7, 3, 9], jnp.uint32)
        np.testing.assert_array_equal(distinct_prefix_count(h), [1, 1, 2, 2, 3, 3, 4])

    def test_target_size_matches_cpp_formula(self):
        # hand-computed from take_while_kld.hpp:73-81 with eps=0.05, z=3
        def cpp_target(k, eps=0.05, z=3.0):
            if k <= 2:
                return float("inf")
            common = 2.0 / (9 * (k - 1))
            base = 1.0 - common + np.sqrt(common) * z
            return np.ceil(((k - 1) / (2 * eps)) * base**3)

        ks = jnp.asarray([3, 5, 10, 50, 200])
        got = np.asarray(kld_target_size(ks, 0.05, 3.0))
        want = [cpp_target(int(k)) for k in np.asarray(ks)]
        np.testing.assert_allclose(got, want)

    def test_min_particles_floor(self):
        # all candidates in one bucket -> target is inf while k<=2 is never
        # exceeded... all same hash: k=1 so target=inf -> keeps everything
        h = jnp.zeros(100, jnp.uint32)
        n = int(kld_active_count(h, 10, 100, 0.05, 3.0))
        assert n == 100

    def test_stops_when_diverse_enough(self):
        # k buckets cycle: with few distinct buckets the target is small
        h = jnp.asarray(np.arange(1000) % 4, jnp.uint32)
        n = int(kld_active_count(h, 10, 1000, 0.05, 3.0))
        # target(4) = ceil(30 * (1 - 2/27 + sqrt(2/27)*3)^3) = 159: the
        # sequential take-while keeps counts <= 159 and stops there
        assert n == 159

    def test_max_cap(self):
        h = jnp.asarray(np.arange(500), jnp.uint32)  # all distinct, target huge
        n = int(kld_active_count(h, 10, 300, 0.05, 3.0))
        assert n == 300

    def test_sequential_equivalence(self):
        # brute-force replica of the C++ take-while semantics
        rng = np.random.default_rng(3)
        h = rng.integers(0, 30, size=400).astype(np.uint32)

        def cpp_take_while(hashes, min_n, max_n, eps=0.05, z=3.0):
            buckets = set()
            count = 0
            for hh in hashes:
                count += 1
                buckets.add(int(hh))
                k = len(buckets)
                if k <= 2:
                    target = float("inf")
                else:
                    common = 2.0 / (9 * (k - 1))
                    base = 1.0 - common + np.sqrt(common) * z
                    target = np.ceil(((k - 1) / (2 * eps)) * base**3)
                if not (count <= min_n or count <= target):
                    return min(count - 1, max_n)
            return min(count, max_n)

        want = cpp_take_while(h, 50, 400)
        got = int(kld_active_count(jnp.asarray(h), 50, 400, 0.05, 3.0))
        assert got == want


class TestThrun:
    def test_no_recovery_when_constant(self):
        state = ThrunState.init()
        for _ in range(10):
            state, p = thrun_update(state, 0.001, 0.1, jnp.float32(0.5))
        assert float(p) == 0.0

    def test_recovery_on_weight_drop(self):
        state = ThrunState.init()
        for _ in range(20):
            state, p = thrun_update(state, 0.001, 0.5, jnp.float32(1.0))
        # sudden drop: fast filter tracks down quicker than slow
        for _ in range(3):
            state, p = thrun_update(state, 0.001, 0.5, jnp.float32(0.1))
        assert float(p) > 0.3

    def test_seeding(self):
        # first sample seeds both filters exactly (exponential_filter.hpp:37-44)
        state, p = thrun_update(ThrunState.init(), 0.001, 0.1, jnp.float32(0.7))
        np.testing.assert_allclose(state.slow.value, 0.7)
        np.testing.assert_allclose(state.fast.value, 0.7)
        assert float(p) == 0.0


class TestTreeUtils:
    def test_tree_take_se2(self):
        states = SE2.from_xytheta(jnp.arange(5.0), jnp.zeros(5), jnp.zeros(5))
        taken = tree_take(states, jnp.asarray([4, 0, 2]))
        np.testing.assert_allclose(taken.x, [4.0, 0.0, 2.0])

    def test_tree_where(self):
        a = SE2.from_xytheta(jnp.ones(3), jnp.ones(3), jnp.zeros(3))
        b = SE2.from_xytheta(jnp.zeros(3), jnp.zeros(3), jnp.zeros(3))
        out = tree_where(jnp.asarray([True, False, True]), a, b)
        np.testing.assert_allclose(out.x, [1.0, 0.0, 1.0])


def test_distinct_prefix_triangular_matches_sort():
    from beluga_tpu.algorithms.kld import (
        _distinct_prefix_count_triangular,
        distinct_prefix_count,
    )

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.integers(0, 40, 700), jnp.uint32)  # many duplicates
    np.testing.assert_array_equal(
        np.asarray(_distinct_prefix_count_triangular(h)),
        np.asarray(distinct_prefix_count(h)),
    )


class TestPooledFreeCellSampler:
    """pallas_pool_take + sample_uniform_free_cells_pooled (core/random.py)."""

    def test_pool_take_exact(self):
        from beluga_tpu.ops.pallas_lookup import pallas_pool_take

        rng = np.random.default_rng(0)
        pool = jnp.asarray(rng.normal(0, 10, (256, 2)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 256, 3000))
        out = np.asarray(pallas_pool_take(pool, idx, interpret=True))
        np.testing.assert_array_equal(out, np.asarray(pool)[np.asarray(idx)])

    def test_pooled_sampler_marginal_uniform(self):
        from beluga_tpu.core.random import sample_uniform_free_cells_pooled

        # 16 distinct free cells; the marginal is uniform ACROSS calls (one
        # call's outputs follow its pool's empirical composition — the
        # documented bootstrap deviation), so average over fresh keys
        free = np.stack(
            [np.arange(16, dtype=np.float32), np.zeros(16, np.float32)], -1
        )
        xs = np.concatenate([
            np.asarray(
                sample_uniform_free_cells_pooled(
                    jax.random.PRNGKey(i), 512, jnp.asarray(free),
                    jnp.int32(16), pool=64, interpret=True,
                ).xy[:, 0]
            )
            for i in range(32)
        ]).astype(int)
        counts = np.bincount(xs, minlength=16)
        mean = counts.sum() / 16
        # pool-composition variance dominates (std ≈ 0.085·mean at these
        # sizes); fixed seeds make this deterministic — bounds are ~3σ
        assert counts.min() > 0.7 * mean and counts.max() < 1.3 * mean
        # headings uniform-ish (iid per slot, unaffected by the pool)
        th = np.asarray(
            sample_uniform_free_cells_pooled(
                jax.random.PRNGKey(99), 8192, jnp.asarray(free), jnp.int32(16),
                pool=64, interpret=True,
            ).theta
        )
        assert abs(np.mean(np.cos(th))) < 0.05 and abs(np.mean(np.sin(th))) < 0.05

    def test_builder_pooled_recovery_relocalizes(self):
        """Recovery injection through the pooled generator still relocalizes
        (the end-to-end property the exact gather provides)."""
        from beluga_tpu.filters.builders import make_grid_random_state_fn
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid

        data = np.zeros((32, 32), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        grid = make_grid(data, 0.1)
        fn = make_grid_random_state_fn(recovery_candidates=64)
        states = fn({"grid": grid}, jax.random.PRNGKey(1), 512)
        xy = np.asarray(states.xy)
        # all samples on free cells (inside the walls), spread over the map
        assert (xy > 0.1).all() and (xy < 3.1).all()
        assert xy[:, 0].std() > 0.4 and xy[:, 1].std() > 0.4
