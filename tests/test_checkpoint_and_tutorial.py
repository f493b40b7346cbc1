"""Checkpoint/resume determinism and the 1D tutorial exemplar."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from beluga_tpu.core.random import sample_normal_se2
from beluga_tpu.filters.amcl import AmclParams, init_state, update
from beluga_tpu.filters.builders import make_likelihood_field_filter
from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.utils.checkpoint import load_state, save_state


def make_world():
    data = np.zeros((60, 60), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[25:30, 25:30] = OCCUPIED_VALUE
    return make_grid(data, 0.1)


def test_checkpoint_resume_is_deterministic(tmp_path):
    grid = make_world()
    models, ctx = make_likelihood_field_filter(grid)
    params = AmclParams(max_particles=200, min_particles=50)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    states = sample_normal_se2(
        k1, 200, SE2.from_xytheta(3.0, 3.0, 0.0), jnp.eye(3) * 0.2
    )
    state = init_state(k2, states, params)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (20, 2)), jnp.float32)
    mask = jnp.ones(20, bool)

    # run 2 steps, checkpoint, run 2 more
    for i in range(2):
        state, _ = update(params, models, ctx, state, SE2.from_xytheta(0.3 * (i + 1), 0, 0), pts, mask)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_state(path, state)

    cont_a = state
    for i in range(2):
        cont_a, est_a = update(params, models, ctx, cont_a, SE2.from_xytheta(0.3 * (i + 3), 0, 0), pts, mask)

    # restore and replay: identical trajectory
    cont_b = load_state(path, state)
    for i in range(2):
        cont_b, est_b = update(params, models, ctx, cont_b, SE2.from_xytheta(0.3 * (i + 3), 0, 0), pts, mask)

    np.testing.assert_array_equal(
        np.asarray(cont_a.particles.log_weight), np.asarray(cont_b.particles.log_weight)
    )
    np.testing.assert_array_equal(np.asarray(est_a.pose.xy), np.asarray(est_b.pose.xy))


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    import pytest

    a = {"x": jnp.zeros(3)}
    path = os.path.join(tmp_path, "c.npz")
    save_state(path, a)
    with pytest.raises(ValueError):
        load_state(path, {"x": jnp.zeros(4)})


def test_tutorial_converges():
    sys.path.insert(0, ".")
    from examples.tutorial_1d import main

    tail = main()
    assert tail < 1.0


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax per-shard checkpoint of a mesh-sharded fleet state."""
    import numpy as np
    from jax.sharding import Mesh

    from beluga_tpu.core.random import sample_normal_se2
    from beluga_tpu.filters.amcl import AmclParams, init_state
    from beluga_tpu.lie import SE2
    from beluga_tpu.parallel.fleet import shard_fleet
    from beluga_tpu.utils.checkpoint import load_state_sharded, save_state_sharded

    params = AmclParams(max_particles=64, min_particles=16)

    @jax.jit
    def init(keys):
        def one(key):
            k1, k2 = jax.random.split(key)
            states = sample_normal_se2(
                k1, 64, SE2.from_xytheta(1.0, 1.0, 0.0), jnp.eye(3) * 0.1
            )
            return init_state(k2, states, params)

        return jax.vmap(one)(keys)

    state = init(jax.random.split(jax.random.PRNGKey(0), 4))
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    state = shard_fleet(mesh, state)

    path = str(tmp_path / "ckpt")
    save_state_sharded(path, state)
    restored = load_state_sharded(path, state)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding == a.sharding
