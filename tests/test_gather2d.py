"""Table-lookup implementations: exactness and low-rank error bounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.ops.gather2d import (
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
