"""Fleet-level windowed-scan LUT path (builders.make_winlut_fleet_update).

The fleet branch sits OUTSIDE the per-filter vmap (a real lax.cond), one
window build is shared by every filter, and the gate takes the min
per-filter kernel-exact coverage.  Verified against the exact fleet step:
tracking fleets ride the fast path and stay accurate; a single diverged
filter trips the whole fleet onto the exact path (bit-identical weights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.core.particles import tree_take
from beluga_tpu.core.random import sample_normal_se2, sample_uniform_box_se2
from beluga_tpu.filters.amcl import AmclParams, init_state
from beluga_tpu.filters.builders import make_winlut_fleet_update
from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.models.sensor.likelihood_field import LikelihoodFieldParams

CENTER = (3.2, 3.2, 0.7)
N, B = 256, 4


@pytest.fixture(scope="module")
def world():
    data = np.zeros((64, 64), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[25:30, 40:45] = OCCUPIED_VALUE
    data[45:48, 12:18] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)

    rng = np.random.default_rng(0)
    n_beams = 24
    angles = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    r = rng.uniform(0.5, 2.0, n_beams)
    pts = np.stack([r * np.cos(angles), r * np.sin(angles)], -1)
    points = jnp.asarray(np.broadcast_to(pts, (B, n_beams, 2)), jnp.float32)
    masks = jnp.ones((B, n_beams), bool)
    return grid, points, masks


def _fleet_state(key, params, sampler):
    def one(k):
        k1, k2 = jax.random.split(k)
        states = sampler(k1)
        states = tree_take(states, jnp.argsort(states.theta))
        return init_state(k2, states, params)

    return jax.vmap(one)(jax.random.split(key, B))


def _make(grid, **kw):
    params = AmclParams(
        max_particles=N, min_particles=N, sorted_slots=True,
        update_min_d=0.0, update_min_a=0.0,
    )
    step, ctx = make_winlut_fleet_update(
        params, grid, LikelihoodFieldParams(max_laser_distance=5.0),
        k_bins=32, win=48, max_point_radius=2.5, tile=128, tblk=8,
        **kw,
    )
    return params, step, ctx


def test_fleet_fast_path_tracks(world):
    grid, points, masks = world
    params, step, ctx = _make(grid)

    def sampler(k):
        return sample_normal_se2(
            k, N, SE2.from_xytheta(*CENTER),
            jnp.diag(jnp.asarray([0.01, 0.01, 0.01], jnp.float32)),
        )

    st = _fleet_state(jax.random.PRNGKey(0), params, sampler)
    odoms = SE2.from_xytheta(
        jnp.full((B,), CENTER[0]), jnp.full((B,), CENTER[1]),
        jnp.full((B,), CENTER[2]),
    )
    jstep = jax.jit(step)
    for _ in range(3):
        st, est = jstep(ctx, st, odoms, points, masks)
    err = np.hypot(
        np.asarray(est.pose.xy[..., 0]) - CENTER[0],
        np.asarray(est.pose.xy[..., 1]) - CENTER[1],
    )
    assert np.all(est.valid)
    assert np.all(err < 0.35), err


def test_fleet_one_diverged_filter_trips_exact(world):
    """The gate is the MIN per-filter coverage: 3 converged filters + 1
    uniform filter must produce weights bit-identical to the exact fleet
    step (the fast branch must NOT run)."""
    from beluga_tpu.filters.amcl import update as amcl_update
    from beluga_tpu.filters.builders import make_likelihood_field_filter

    grid, points, masks = world
    params, step, ctx = _make(grid)

    def sampler_narrow(k):
        return sample_normal_se2(
            k, N, SE2.from_xytheta(*CENTER),
            jnp.diag(jnp.asarray([0.01, 0.01, 0.01], jnp.float32)),
        )

    st = _fleet_state(jax.random.PRNGKey(1), params, sampler_narrow)
    # filter 0 -> uniform over the whole map (diverged)
    wide = sample_uniform_box_se2(
        jax.random.PRNGKey(7), N,
        jnp.asarray([0.5, 0.5], jnp.float32),
        jnp.asarray([5.9, 5.9], jnp.float32),
    )
    repl = jax.tree_util.tree_map(
        lambda leaf, w: leaf.at[0].set(w), st.particles.state, wide
    )
    st = st._replace(particles=st.particles.replace(state=repl))

    odoms = SE2.from_xytheta(
        jnp.full((B,), CENTER[0]), jnp.full((B,), CENTER[1]),
        jnp.full((B,), CENTER[2]),
    )
    st2, est2 = jax.jit(step)(ctx, st, odoms, points, masks)

    # reference: the exact fleet step from the same state/keys
    import functools

    models_e, ctx_e = make_likelihood_field_filter(
        grid, LikelihoodFieldParams(max_laser_distance=5.0),
        lookup_mode="auto", recovery_candidates=256,
    )
    exact = jax.vmap(
        functools.partial(amcl_update, params, models_e),
        in_axes=(None, 0, 0, 0, 0),
    )
    st3, est3 = jax.jit(exact)(ctx_e, st, odoms, points, masks)
    np.testing.assert_allclose(
        np.asarray(est2.pose.xy), np.asarray(est3.pose.xy), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(st2.particles.log_weight),
        np.asarray(st3.particles.log_weight), rtol=1e-5, atol=1e-6,
    )
