"""1D localization tutorial — the minimal API exemplar.

Re-creation of beluga_tutorial/src/main.cpp:1-255 on the TPU framework: a
robot moves along a 1D corridor at constant velocity past known landmarks;
particles are plain scalars (the framework's particle storage and
resampling are generic over the state pytree, like the reference's
``Particle = tuple<double, Weight>``).

Per cycle: propagate (velocity + Gaussian noise) → reweight (product of
per-landmark range Gaussians + minimum weight) → normalize → systematic
resample → weighted mean/variance estimate.

Run: python examples/tutorial_1d.py
"""

from __future__ import annotations

import dataclasses
import functools
import sys

import os

import jax

# a pre-registered TPU plugin overrides the JAX_PLATFORMS env var at
# startup; the config update after import is authoritative (NOTES.md)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from beluga_tpu.algorithms.estimation import estimate_scalar  # noqa: E402
from beluga_tpu.core.particles import DEAD_LOG_WEIGHT, ParticleSet, make_from_states  # noqa: E402
from beluga_tpu.core.weights import normalize  # noqa: E402
from beluga_tpu.ops.resample import systematic_indices  # noqa: E402


@dataclasses.dataclass(frozen=True)
class TutorialParams:
    """Mirrors beluga::tutorial::Parameters (main.cpp:40-110)."""

    map_size: int = 100
    number_of_particles: int = 300
    number_of_cycles: int = 100
    initial_position: float = 0.0
    initial_position_sigma: float = 10.0
    dt: float = 1.0
    velocity: float = 1.0
    motion_model_sigma: float = 1.0
    sensor_range: float = 3.0
    sensor_model_sigma: float = 1.0
    min_particle_weight: float = 0.08


LANDMARKS = jnp.asarray([5.0, 12.0, 25.0, 37.0, 52.0, 55.0, 65.0, 74.0, 85.0, 95.0])


def sense(position, landmarks, sensor_range):
    """Ranges to landmarks within the sensor field of view (masked)."""
    d = landmarks - position
    visible = jnp.abs(d) <= sensor_range
    return d, visible


@functools.partial(jax.jit, static_argnums=(0,))
def cycle(p: TutorialParams, key, particles: ParticleSet, measurement, meas_mask):
    k_mot, k_res = jax.random.split(key)

    # propagate: x += v dt + noise (main.cpp motion update)
    n = particles.capacity
    noise = jax.random.normal(k_mot, (n,)) * p.motion_model_sigma
    states = particles.state + p.velocity * p.dt + noise

    # reweight: product over detections of range Gaussian + min weight
    d = LANDMARKS[None, :] - states[:, None]  # [N, L]
    err = d - measurement[None, :]
    pz = jnp.exp(-jnp.square(err) / (2.0 * p.sensor_model_sigma**2))
    pz = jnp.where(meas_mask[None, :], pz, 1.0)
    lik = jnp.maximum(jnp.prod(pz, axis=-1), p.min_particle_weight)
    particles = ParticleSet(states, particles.log_weight + jnp.log(lik), particles.active)
    particles = normalize(particles)

    # estimate before resampling (weighted)
    mean, var = estimate_scalar(particles.state, particles.weight, particles.mask)

    # systematic resample back to N with weight 1
    idx = systematic_indices(k_res, particles.weight, n)
    particles = make_from_states(particles.state[idx])
    return particles, (mean, var)


def main():
    p = TutorialParams()
    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    init_states = p.initial_position + p.initial_position_sigma * jax.random.normal(
        k_init, (p.number_of_particles,)
    )
    particles = make_from_states(init_states)

    true_pos = p.initial_position
    errors = []
    for t in range(p.number_of_cycles):
        true_pos += p.velocity * p.dt
        if true_pos > p.map_size:
            break
        meas, mask = sense(true_pos, LANDMARKS, p.sensor_range)
        key, k = jax.random.split(key)
        particles, (mean, var) = cycle(p, k, particles, meas, mask)
        errors.append(abs(float(mean) - true_pos))
        if t % 10 == 0:
            print(
                f"t={t:3d}  true={true_pos:6.2f}  est={float(mean):6.2f} "
                f"sd={float(var)**0.5:5.2f}  err={errors[-1]:5.2f}"
            )
    tail = np.mean(errors[len(errors) // 2:])
    print(f"mean |error| over the second half: {tail:.3f} m")
    return tail


if __name__ == "__main__":
    main()
