"""Thrun adaptive-recovery probability estimation (Probabilistic Robotics 8.3.3).

Functional ports of:
  * ``ExponentialFilter`` (algorithm/exponential_filter.hpp:26-50):
    ``out += alpha * (in - out)``, seeded with the first input after reset.
  * ``ThrunRecoveryProbabilityEstimator``
    (algorithm/thrun_recovery_probability_estimator.hpp:40-95): feeds the
    *average particle weight* through slow/fast filters and returns
    ``clamp(1 - fast/slow, 0, 1)``.

Note a deliberate reference parity quirk: the estimator runs *after* the
normalize action (amcl_core.hpp:174-179), so the average weight it sees is
exactly ``1 / N_active`` — recovery is driven by changes in the KLD-adaptive
particle count, not by raw likelihood mass.  We reproduce this behavior.

State is carried explicitly (value + seeded flag) so the estimator nests in
jit/vmap/scan.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class ExpFilterState(NamedTuple):
    value: Array  # f32
    seeded: Array  # bool

    @staticmethod
    def init() -> "ExpFilterState":
        return ExpFilterState(jnp.float32(0.0), jnp.asarray(False))


def exp_filter_update(state: ExpFilterState, alpha: float, x: Array) -> ExpFilterState:
    new_value = jnp.where(state.seeded, state.value + alpha * (x - state.value), x)
    return ExpFilterState(new_value.astype(jnp.float32), jnp.asarray(True))


class ThrunState(NamedTuple):
    slow: ExpFilterState
    fast: ExpFilterState

    @staticmethod
    def init() -> "ThrunState":
        return ThrunState(ExpFilterState.init(), ExpFilterState.init())


def thrun_update(
    state: ThrunState, alpha_slow: float, alpha_fast: float, average_weight: Array
) -> tuple[ThrunState, Array]:
    """Returns (new state, random-state probability in [0, 1])."""
    slow = exp_filter_update(state.slow, alpha_slow, average_weight)
    fast = exp_filter_update(state.fast, alpha_fast, average_weight)
    prob = jnp.where(
        jnp.abs(slow.value) < jnp.finfo(jnp.float32).eps,
        0.0,
        jnp.clip(1.0 - fast.value / jnp.where(jnp.abs(slow.value) < 1e-38, 1.0, slow.value), 0.0, 1.0),
    )
    return ThrunState(slow, fast), prob
