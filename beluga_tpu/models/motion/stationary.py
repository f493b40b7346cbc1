"""Stationary motion model: Gaussian jitter about the current state.

Port of ``motion/stationary_model.hpp:39-60``: ignores the control action and
right-multiplies each state by a small random transform
``SE2(N(0, 0.02), (N(0, 0.02), N(0, 0.02)))`` — i.e. body-frame jitter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beluga_tpu.lie import SE2, SO2

Array = jax.Array

_SIGMA = 0.02


def stationary_propagate(key: Array, states: SE2) -> SE2:
    n = states.shape[0]
    z = jax.random.normal(key, (3, n), jnp.float32) * _SIGMA
    new_xy = states.xy + states.rot.act(jnp.stack([z[1], z[2]], axis=-1))
    return SE2(new_xy, SO2.exp(states.theta + z[0]))
