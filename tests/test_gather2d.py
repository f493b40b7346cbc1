"""Table-lookup implementations: exactness and low-rank error bounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.ops.gather2d import (
    _codebook_lookup,
    _lowrank_lookup,
    _onehot_lookup,
    factorize_table,
    table_lookup,
)


@pytest.fixture
def table():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((96, 128)), jnp.float32)


def queries(shape, h, w, seed=1):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.integers(-5, h + 5, shape), jnp.int32),
        jnp.asarray(rng.integers(-5, w + 5, shape), jnp.int32),
    )


def test_onehot_exact(table):
    h, w = table.shape
    yi, xi = queries((300, 7), h, w)
    want = table_lookup(table, yi, xi, mode="gather")
    got = _onehot_lookup(table, yi, xi)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_onehot_jittable_and_vmappable(table):
    h, w = table.shape
    yi, xi = queries((4, 64, 5), h, w)
    f = jax.jit(jax.vmap(lambda y, x: _onehot_lookup(table, y, x)))
    got = f(yi, xi)
    want = table_lookup(table, yi, xi, mode="gather")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lowrank_error_bounded(table):
    h, w = table.shape
    u, v = factorize_table(table, rank=min(h, w))  # full rank -> exact-ish
    yi, xi = queries((500,), h, w)
    got = _lowrank_lookup(u, v, yi, xi)
    want = table_lookup(table, yi, xi, mode="gather")
    # full-rank bf16 factors: error limited by bf16 rounding
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.03)


def test_lowrank_smooth_field_compresses():
    # a Gaussian-blurred field (like a likelihood field) at low rank
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
    from beluga_tpu.models.sensor.likelihood_field import (
        LikelihoodFieldParams,
        make_likelihood_field,
    )

    rng = np.random.default_rng(2)
    data = np.zeros((128, 128), np.int8)
    data[rng.random((128, 128)) < 0.02] = OCCUPIED_VALUE
    field = make_likelihood_field(LikelihoodFieldParams(), make_grid(data, 0.1))
    u, v = factorize_table(field.values, rank=48)
    yi, xi = queries((2000,), 128, 128, seed=3)
    got = _lowrank_lookup(u, v, yi, xi)
    want = table_lookup(field.values, yi, xi, mode="gather")
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert err.max() < 0.05 * float(field.values.max())


def test_auto_mode_cpu_uses_gather(table):
    h, w = table.shape
    yi, xi = queries((10,), h, w)
    np.testing.assert_array_equal(
        np.asarray(table_lookup(table, yi, xi, mode="auto")),
        np.asarray(table_lookup(table, yi, xi, mode="gather")),
    )


def test_lf_model_modes_agree():
    from beluga_tpu.lie import SE2
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
    from beluga_tpu.models.sensor.likelihood_field import (
        LikelihoodFieldParams,
        likelihood_field_weights,
        make_likelihood_field,
    )

    data = np.zeros((32, 32), np.int8)
    data[10, 12] = OCCUPIED_VALUE
    field = make_likelihood_field(LikelihoodFieldParams(), make_grid(data, 0.25))
    rng = np.random.default_rng(4)
    states = SE2.from_xytheta(
        jnp.asarray(rng.uniform(0, 8, 50), jnp.float32),
        jnp.asarray(rng.uniform(0, 8, 50), jnp.float32),
        jnp.asarray(rng.uniform(-3, 3, 50), jnp.float32),
    )
    pts = jnp.asarray(rng.uniform(-2, 2, (9, 2)), jnp.float32)
    mask = jnp.ones(9, bool)
    w_g = likelihood_field_weights(field, states, pts, mask, lookup_mode="gather")
    w_o = likelihood_field_weights(field, states, pts, mask, lookup_mode="onehot")
    np.testing.assert_array_equal(np.asarray(w_g), np.asarray(w_o))


def test_lowrank_filter_end_to_end():
    """The lowrank fast path tracks as well as exact on a synthetic world."""
    import functools
    from beluga_tpu.core.random import sample_normal_se2
    from beluga_tpu.filters.amcl import AmclParams, init_state, update
    from beluga_tpu.filters.builders import make_likelihood_field_filter
    from beluga_tpu.lie import SE2
    from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid

    data = np.zeros((80, 80), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[30:35, 50:55] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)
    models, ctx = make_likelihood_field_filter(grid, lookup_mode="lowrank")
    assert "field_factors" in ctx

    params = AmclParams(max_particles=300, min_particles=60)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    states = sample_normal_se2(k1, 300, SE2.from_xytheta(4.0, 4.0, 0.0), jnp.eye(3) * 0.2)
    state = init_state(k2, states, params)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (30, 2)), jnp.float32)
    mask = jnp.ones(30, bool)
    for i in range(3):
        state = state._replace(force_update=jnp.asarray(True))
        state, est = update(params, models, ctx, state, SE2.identity(), pts, mask)
    assert bool(est.valid)
    assert np.isfinite(np.asarray(est.pose.xy)).all()
    assert np.isfinite(np.asarray(state.particles.log_weight)).all()


class TestCodebook:
    """Exact-to-codebook lookup path (maps/codebook.py + _codebook_lookup)."""

    def _field_setup(self, **lf_kw):
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
        from beluga_tpu.models.sensor.likelihood_field import (
            LikelihoodFieldParams,
            make_likelihood_field,
        )

        data = np.zeros((96, 96), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        data[40:44, 60:66] = OCCUPIED_VALUE
        data[10:14, 10:12] = -1  # unknown patch
        grid = make_grid(data, 0.05)
        params = LikelihoodFieldParams(**lf_kw)
        return grid, params, make_likelihood_field(params, grid)

    @pytest.mark.parametrize("unknown", [False, True])
    def test_reconstruction_exact(self, unknown):
        """book[codes] reproduces the field bit-exactly (production params)."""
        from beluga_tpu.filters.builders import _make_field_codes

        grid, params, field = self._field_setup(model_unknown_space=unknown)
        codes, book = _make_field_codes(field, params, grid)
        recon = np.asarray(book)[np.asarray(codes)]
        np.testing.assert_array_equal(recon, np.asarray(field.values))

    def test_analytic_fallback_close(self):
        """The host-proposed analytic codebook is within 1 ulp of the field."""
        from beluga_tpu.maps.codebook import likelihood_field_codebook
        from beluga_tpu.ops.gather2d import encode_table

        grid, params, field = self._field_setup()
        book = jnp.asarray(likelihood_field_codebook(params, grid.resolution_hint))
        codes = encode_table(field.values, book)
        recon = np.asarray(book)[np.asarray(codes)]
        np.testing.assert_allclose(recon, np.asarray(field.values), rtol=0, atol=2.5e-7)

    def test_codebook_lookup_matches_gather(self):
        from beluga_tpu.filters.builders import _make_field_codes

        grid, params, field = self._field_setup()
        codes, book = _make_field_codes(field, params, grid)
        h, w = field.values.shape
        yi, xi = queries((700,), h, w, seed=3)
        got = _codebook_lookup(codes, book, yi, xi)
        want = table_lookup(field.values, yi, xi, mode="gather")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_codebook_weights_match_exact(self):
        from beluga_tpu.filters.builders import make_likelihood_field_filter
        from beluga_tpu.lie import SE2
        from beluga_tpu.models.sensor.likelihood_field import (
            likelihood_field_weights,
            likelihood_field_weights_codebook,
        )

        grid, params, field = self._field_setup()
        _, ctx = make_likelihood_field_filter(grid, lookup_mode="codebook")
        assert "field_codes" in ctx
        rng = np.random.default_rng(5)
        n, b = 64, 20
        states = SE2.from_xytheta(
            jnp.asarray(rng.uniform(0.3, 4.5, n), jnp.float32),
            jnp.asarray(rng.uniform(0.3, 4.5, n), jnp.float32),
            jnp.asarray(rng.uniform(-3.2, 3.2, n), jnp.float32),
        )
        pts = jnp.asarray(rng.uniform(-2, 2, (b, 2)), jnp.float32)
        mask = jnp.asarray(rng.random(b) < 0.9)
        want = likelihood_field_weights(field, states, pts, mask, lookup_mode="gather")
        got = likelihood_field_weights_codebook(
            ctx["field"], ctx["field_codes"], states, pts, mask
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=1e-6)

    def test_codebook_oversubscribed_merges(self):
        """> 256 distinct values still produce a tight codebook."""
        from beluga_tpu.maps.codebook import likelihood_field_codebook
        from beluga_tpu.models.sensor.likelihood_field import LikelihoodFieldParams

        params = LikelihoodFieldParams(sigma_hit=2.0)  # wide: many distinct values
        book = likelihood_field_codebook(params, 0.05)
        assert book.shape == (256,)
        assert np.all(np.diff(book) >= 0)

    def test_update_map_ctx_refreshes_codes(self):
        from beluga_tpu.filters.builders import make_likelihood_field_filter, update_map_ctx
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
        from beluga_tpu.models.sensor.likelihood_field import LikelihoodFieldParams

        grid, params, field = self._field_setup()
        _, ctx = make_likelihood_field_filter(grid, lookup_mode="codebook")
        data2 = np.zeros((96, 96), np.int8)
        data2[0, :] = data2[-1, :] = data2[:, 0] = data2[:, -1] = OCCUPIED_VALUE
        grid2 = make_grid(data2, 0.05)
        ctx2 = update_map_ctx(ctx, grid2, LikelihoodFieldParams())
        recon = np.asarray(ctx2["field_codes"][1])[np.asarray(ctx2["field_codes"][0])]
        np.testing.assert_array_equal(recon, np.asarray(ctx2["field"].values))

    def test_builder_rejects_unknown_lookup_mode(self):
        from beluga_tpu.filters.builders import make_likelihood_field_filter
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid

        data = np.zeros((16, 16), np.int8)
        data[0, :] = OCCUPIED_VALUE
        with pytest.raises(ValueError, match="lookup_mode"):
            make_likelihood_field_filter(make_grid(data, 0.1), lookup_mode="bogus")

    def test_pallas_kernel_matches_gather_interpret(self):
        """The fused Pallas lookup (interpret mode on CPU) is bit-exact."""
        from beluga_tpu.filters.builders import _make_field_codes
        from beluga_tpu.ops.pallas_lookup import pallas_codebook_lookup

        grid, params, field = self._field_setup()
        codes, book = _make_field_codes(field, params, grid)
        h, w = field.values.shape
        yi, xi = queries((900,), h, w, seed=7)
        got = pallas_codebook_lookup(codes, book, yi, xi, interpret=True)
        want = table_lookup(field.values, yi, xi, mode="gather")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_fused_reweight_kernel_interpret(self):
        """The fully-fused reweight kernel matches the XLA codebook path."""
        from beluga_tpu.filters.builders import _make_field_codes
        from beluga_tpu.lie import SE2
        from beluga_tpu.models.sensor.likelihood_field import (
            likelihood_field_weights,
        )
        from beluga_tpu.ops.pallas_reweight import fused_reweight

        grid, params, field = self._field_setup()
        codes, book = _make_field_codes(field, params, grid)
        rng = np.random.default_rng(11)
        n, b = 130, 17  # non-multiples exercise padding
        states = SE2.from_xytheta(
            jnp.asarray(rng.uniform(0.3, 4.5, n), jnp.float32),
            jnp.asarray(rng.uniform(0.3, 4.5, n), jnp.float32),
            jnp.asarray(rng.uniform(-3.2, 3.2, n), jnp.float32),
        )
        pts = jnp.asarray(rng.uniform(-3, 3, (b, 2)), jnp.float32)
        mask = jnp.asarray(rng.random(b) < 0.9)
        tf = field.world_to_field @ states
        got = fused_reweight(
            codes, book, tf.x, tf.y, tf.rot.cos, tf.rot.sin,
            pts, mask, field.resolution, field.unknown_prob, interpret=True,
        )
        want = likelihood_field_weights(field, states, pts, mask, lookup_mode="gather")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=2e-5)

    def test_fused_reweight_odd_map_dims(self):
        """Maps whose dims aren't (8, 128) multiples exercise the pad path."""
        from beluga_tpu.lie import SE2
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
        from beluga_tpu.models.sensor.likelihood_field import (
            LikelihoodFieldParams,
            likelihood_field_weights,
            make_likelihood_field,
        )
        from beluga_tpu.filters.builders import _make_field_codes
        from beluga_tpu.ops.pallas_reweight import fused_reweight

        data = np.zeros((75, 53), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        data[30:33, 20:24] = OCCUPIED_VALUE
        grid = make_grid(data, 0.1)
        params = LikelihoodFieldParams()
        field = make_likelihood_field(params, grid)
        codes, book = _make_field_codes(field, params, grid)
        rng = np.random.default_rng(3)
        n, b = 90, 11
        states = SE2.from_xytheta(
            jnp.asarray(rng.uniform(0.2, 5.0, n), jnp.float32),
            jnp.asarray(rng.uniform(0.2, 7.2, n), jnp.float32),
            jnp.asarray(rng.uniform(-3.14, 3.14, n), jnp.float32))
        pts = jnp.asarray(rng.uniform(-2, 2, (b, 2)), jnp.float32)
        mask = jnp.ones(b, bool)
        tf = field.world_to_field @ states
        got = fused_reweight(codes, book, tf.x, tf.y, tf.rot.cos, tf.rot.sin,
                             pts, mask, field.resolution, field.unknown_prob,
                             interpret=True)
        want = likelihood_field_weights(field, states, pts, mask, lookup_mode="gather")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=2e-5)


class TestBeamWindowFastPath:
    """Per-beam-window bf16 fast path of the fused reweight kernel
    (ops/pallas_reweight.py `values3=`): converged tiles use [64, 128]
    bf16(pz^3) windows per beam, everything else falls back to the exact
    tier path."""

    def _setup(self):
        from beluga_tpu.filters.builders import _make_field_codes
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
        from beluga_tpu.models.sensor.likelihood_field import (
            LikelihoodFieldParams,
            make_likelihood_field,
        )
        from beluga_tpu.ops.pallas_reweight import build_values3

        data = np.zeros((96, 96), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        data[40:44, 60:66] = OCCUPIED_VALUE
        grid = make_grid(data, 0.05)
        params = LikelihoodFieldParams()
        field = make_likelihood_field(params, grid)
        codes, book = _make_field_codes(field, params, grid)
        return field, codes, book, build_values3(codes, book)

    def _states(self, n, cx, cy, sig_xy=0.02, sig_th=0.01, seed=5):
        from beluga_tpu.lie import SE2

        rng = np.random.default_rng(seed)
        return SE2.from_xytheta(
            jnp.asarray(rng.normal(cx, sig_xy, n), jnp.float32),
            jnp.asarray(rng.normal(cy, sig_xy, n), jnp.float32),
            jnp.asarray(rng.normal(0.4, sig_th, n), jnp.float32),
        )

    def _run(self, field, codes, book, states, pts, mask, values3):
        from beluga_tpu.ops.pallas_reweight import fused_reweight

        tf = field.world_to_field @ states
        return fused_reweight(
            codes, book, tf.x, tf.y, tf.rot.cos, tf.rot.sin, pts, mask,
            field.resolution, field.unknown_prob, interpret=True,
            values3=values3,
        )

    def _scan(self, b=23, r=1.9, seed=2):
        rng = np.random.default_rng(seed)
        ang = np.linspace(-2.0, 2.0, b)
        rr = rng.uniform(0.2, r, b)
        pts = jnp.asarray(np.stack([rr * np.cos(ang), rr * np.sin(ang)], -1),
                          jnp.float32)
        return pts, jnp.asarray(rng.random(b) < 0.9)

    def test_converged_matches_bf16_reference(self):
        """The fast branch fires on a converged cloud and reproduces the
        bf16(pz^3)-table reference in beam order."""
        field, codes, book, v3 = self._setup()
        states = self._states(130, 2.4, 2.4)
        pts, mask = self._scan()
        got = self._run(field, codes, book, states, pts, mask, v3)

        vals3 = ((book.astype(jnp.float32) ** 3)[codes]
                 .astype(jnp.bfloat16).astype(jnp.float32))
        tf = field.world_to_field @ states
        h, w = codes.shape
        unk3 = field.unknown_prob ** 3
        acc = jnp.zeros(states.x.shape, jnp.float32)
        for b in range(pts.shape[0]):
            x = pts[b, 0] * tf.rot.cos - pts[b, 1] * tf.rot.sin + tf.x
            y = pts[b, 0] * tf.rot.sin + pts[b, 1] * tf.rot.cos + tf.y
            xi = jnp.floor(x / field.resolution).astype(jnp.int32)
            yi = jnp.floor(y / field.resolution).astype(jnp.int32)
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            val = vals3[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
            pz3 = jnp.where(inside, val, unk3)
            acc = acc + jnp.where(mask[b], pz3, 0.0)
        want = 1.0 + acc
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)

    def test_converged_close_to_exact(self):
        """bf16 table error stays below 0.5% of the exact weights."""
        field, codes, book, v3 = self._setup()
        states = self._states(130, 2.4, 2.4)
        pts, mask = self._scan()
        got = self._run(field, codes, book, states, pts, mask, v3)
        exact = self._run(field, codes, book, states, pts, mask, None)
        rel = np.max(np.abs(np.asarray(got) - np.asarray(exact))
                     / np.asarray(exact))
        assert rel < 5e-3

    def test_edge_cloud_clipping(self):
        """Clouds at the map corner clip their windows without touching
        out-of-range table rows; out-of-map beams read unknown_prob."""
        field, codes, book, v3 = self._setup()
        for cx, cy in [(0.2, 0.2), (4.6, 4.6), (0.2, 4.6)]:
            states = self._states(90, cx, cy, seed=int(cx * 10 + cy))
            pts, mask = self._scan()
            got = self._run(field, codes, book, states, pts, mask, v3)
            exact = self._run(field, codes, book, states, pts, mask, None)
            rel = np.max(np.abs(np.asarray(got) - np.asarray(exact))
                         / np.asarray(exact))
            assert rel < 5e-3, (cx, cy, rel)

    def test_diverged_small_map_covered_bf16(self):
        """On a small map the block windows cover everything, so even a
        diverged cloud stays on the (bf16-accurate, clamp-free) fast path."""
        field, codes, book, v3 = self._setup()
        rng = np.random.default_rng(9)
        from beluga_tpu.lie import SE2

        states = SE2.from_xytheta(
            jnp.asarray(rng.uniform(0.3, 4.5, 140), jnp.float32),
            jnp.asarray(rng.uniform(0.3, 4.5, 140), jnp.float32),
            jnp.asarray(rng.uniform(-3.1, 3.1, 140), jnp.float32),
        )
        pts, mask = self._scan()
        got = np.asarray(self._run(field, codes, book, states, pts, mask, v3))
        exact = np.asarray(self._run(field, codes, book, states, pts, mask, None))
        assert np.max(np.abs(got - exact) / exact) < 5e-3

    def test_diverged_large_map_falls_back_bit_exact(self):
        """On a large map a diverged cloud overflows every block window:
        most blocks get flagged and the tile takes the exact tier path."""
        from beluga_tpu.filters.builders import _make_field_codes
        from beluga_tpu.lie import SE2
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
        from beluga_tpu.models.sensor.likelihood_field import (
            LikelihoodFieldParams,
            make_likelihood_field,
        )
        from beluga_tpu.ops.pallas_reweight import build_values3

        data = np.zeros((384, 384), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        data[100:120, 200:230] = OCCUPIED_VALUE
        grid = make_grid(data, 0.05)
        params = LikelihoodFieldParams()
        field = make_likelihood_field(params, grid)
        codes, book = _make_field_codes(field, params, grid)
        v3 = build_values3(codes, book)
        rng = np.random.default_rng(9)
        states = SE2.from_xytheta(
            jnp.asarray(rng.uniform(1.0, 18.0, 200), jnp.float32),
            jnp.asarray(rng.uniform(1.0, 18.0, 200), jnp.float32),
            jnp.asarray(rng.uniform(-3.1, 3.1, 200), jnp.float32),
        )
        pts, mask = self._scan()
        got = self._run(field, codes, book, states, pts, mask, v3)
        exact = self._run(field, codes, book, states, pts, mask, None)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))

    def test_builder_mode_codebook16(self):
        """lookup_mode='codebook16' wires the twin table through the ctx and
        the filter update stays finite/normalized."""
        from beluga_tpu.filters.builders import (
            make_likelihood_field_filter,
            update_map_ctx,
        )
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
        from beluga_tpu.models.sensor.likelihood_field import (
            LikelihoodFieldParams,
        )

        data = np.zeros((96, 96), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        grid = make_grid(data, 0.05)
        models, ctx = make_likelihood_field_filter(grid, lookup_mode="codebook16")
        assert "field_values3" in ctx and ctx["field_values3"].dtype == jnp.bfloat16
        ctx2 = update_map_ctx(ctx, grid, LikelihoodFieldParams())
        assert "field_values3" in ctx2

    def test_stray_and_flagged_block_semantics(self):
        """Block-structured fast-path semantics on a sorted 4096 cloud:
        a stray block (pooled last, like the strays-last sort key builds)
        is flagged and matches the exact kernel bit-for-bit; an individual
        stray in an unflagged core block clamps to the floor (only losing
        weight); core particles stay bf16-accurate."""
        from beluga_tpu.lie import SE2
        from beluga_tpu.ops.pallas_reweight import _BLOCKS

        from beluga_tpu.filters.builders import _make_field_codes
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
        from beluga_tpu.models.sensor.likelihood_field import (
            LikelihoodFieldParams,
            make_likelihood_field,
        )
        from beluga_tpu.ops.pallas_reweight import build_values3

        data = np.zeros((384, 384), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        data[100:120, 200:230] = OCCUPIED_VALUE
        grid = make_grid(data, 0.05)
        params = LikelihoodFieldParams()
        field = make_likelihood_field(params, grid)
        codes, book = _make_field_codes(field, params, grid)
        v3 = build_values3(codes, book)
        rng = np.random.default_rng(21)
        n = 4096
        last_start, last_size = _BLOCKS[-1]
        xs = rng.normal(9.6, 0.05, n)
        ys = rng.normal(9.6, 0.05, n)
        th = np.sort(rng.normal(0.4, 0.02, n))
        xs[last_start:] = rng.uniform(1.0, 18.0, last_size)
        ys[last_start:] = rng.uniform(1.0, 18.0, last_size)
        th[last_start:] = rng.uniform(-3.1, 3.1, last_size)
        # one lone stray inside core block 1, at a lane the gate subsample
        # (stride 8) does NOT visit, so the block stays unflagged and the
        # stray clamps
        lone = 1501
        xs[lone], ys[lone] = 3.0, 16.0
        states = SE2.from_xytheta(
            jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
            jnp.asarray(th, jnp.float32),
        )
        pts, mask = self._scan()
        got = np.asarray(self._run(field, codes, book, states, pts, mask, v3))
        exact = np.asarray(self._run(field, codes, book, states, pts, mask, None))
        np.testing.assert_array_equal(got[last_start:], exact[last_start:])
        assert got[lone] <= exact[lone] + 1e-5
        core = np.ones(n, bool)
        core[last_start:] = False
        core[lone] = False
        rel = np.max(np.abs(got[core] - exact[core]) / exact[core])
        assert rel < 5e-3, rel

    def test_multi_tile_filter(self):
        """Filters wider than one 4096-lane tile slice per-tile SMEM origin
        groups (the mega-filter layout bug: per-tile blocks must pad to
        128 lanes)."""
        from beluga_tpu.lie import SE2

        field, codes, book, v3 = self._setup()
        rng = np.random.default_rng(31)
        n = 8192  # two tiles
        states = SE2.from_xytheta(
            jnp.asarray(rng.normal(2.4, 0.05, n), jnp.float32),
            jnp.asarray(rng.normal(2.4, 0.05, n), jnp.float32),
            jnp.asarray(np.sort(rng.normal(0.4, 0.05, n)), jnp.float32),
        )
        pts, mask = self._scan(b=9)
        got = np.asarray(self._run(field, codes, book, states, pts, mask, v3))
        exact = np.asarray(self._run(field, codes, book, states, pts, mask, None))
        rel = np.max(np.abs(got - exact) / exact)
        assert rel < 5e-3, rel

    def test_log_space_prob_model_kernel(self):
        """log_space=True reproduces the LF-prob model's log-weights: exact
        tier path matches the XLA path to transcendental tolerance; the
        values3 fast path stays within bf16 table error."""
        from beluga_tpu.lie import SE2
        from beluga_tpu.models.sensor.likelihood_field import (
            likelihood_field_prob_weights,
        )
        from beluga_tpu.ops.pallas_reweight import build_values3, fused_reweight

        field, codes, book, _ = self._setup()
        v3log = build_values3(codes, book, log_space=True)
        rng = np.random.default_rng(13)
        states = self._states(150, 2.4, 2.4, sig_xy=0.05, sig_th=0.05)
        pts, mask = self._scan(b=17)
        tf = field.world_to_field @ states
        want = likelihood_field_prob_weights(
            field, states, pts, mask, lookup_mode="gather"
        )
        got_exact = fused_reweight(
            codes, book, tf.x, tf.y, tf.rot.cos, tf.rot.sin, pts, mask,
            field.resolution, field.unknown_prob, interpret=True,
            log_space=True,
        )
        np.testing.assert_allclose(
            np.asarray(got_exact), np.asarray(want), rtol=0, atol=1e-4
        )
        got_fast = fused_reweight(
            codes, book, tf.x, tf.y, tf.rot.cos, tf.rot.sin, pts, mask,
            field.resolution, field.unknown_prob, interpret=True,
            values3=v3log, log_space=True,
        )
        np.testing.assert_allclose(
            np.asarray(got_fast), np.asarray(want), rtol=0, atol=0.05
        )

    def test_prob_model_builder_ctx(self):
        """prob_model builders carry the code table (and log-space values3
        for codebook16) through the ctx."""
        from beluga_tpu.filters.builders import make_likelihood_field_filter
        from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid

        data = np.zeros((96, 96), np.int8)
        data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
        grid = make_grid(data, 0.05)
        _, ctx = make_likelihood_field_filter(
            grid, prob_model=True, lookup_mode="codebook16"
        )
        assert "field_codes" in ctx and "field_values3" in ctx
        _, ctx2 = make_likelihood_field_filter(grid, prob_model=True)
        assert "field_codes" in ctx2 and "field_values3" not in ctx2
