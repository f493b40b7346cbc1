"""Weight bookkeeping: normalization and effective sample size.

Reference behavior:
  * ``beluga::actions::normalize`` (actions/normalize.hpp:54-84) divides all
    weights by their sum (no-op if the sum is already ~1).  In log space this
    is ``log_w -= logsumexp(log_w)``, which is the numerically stable analog.
  * ``beluga::effective_sample_size`` (algorithm/effective_sample_size.hpp:46)
    computes ESS = 1 / sum(normalized_weight^2) (Grisetti et al. selective
    resampling criterion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from beluga_tpu.core.particles import DEAD_LOG_WEIGHT, ParticleSet

Array = jax.Array


def masked_logsumexp(log_w: Array, mask: Array, axis=-1) -> Array:
    """logsumexp over alive slots only; safe when everything is masked."""
    neg = jnp.asarray(DEAD_LOG_WEIGHT, log_w.dtype)
    masked = jnp.where(mask, log_w, neg)
    m = jnp.max(masked, axis=axis, keepdims=True)
    m = jnp.maximum(m, neg)  # avoid -inf
    s = jnp.sum(jnp.where(mask, jnp.exp(masked - m), 0.0), axis=axis)
    return jnp.squeeze(m, axis) + jnp.log(jnp.maximum(s, 1e-38))


def normalize(particles: ParticleSet) -> ParticleSet:
    """Divide weights by their total sum (log-space shift).

    Port of actions/normalize.hpp:54-84 with the default factor (sum of
    weights).  Dead slots keep DEAD_LOG_WEIGHT.
    """
    mask = particles.mask
    total = masked_logsumexp(particles.log_weight, mask)
    new_log_w = jnp.where(mask, particles.log_weight - total, DEAD_LOG_WEIGHT)
    return particles.replace(log_weight=new_log_w)


def normalized_weights(particles: ParticleSet) -> Array:
    """Linear weights scaled to sum to one over alive slots."""
    mask = particles.mask
    total = masked_logsumexp(particles.log_weight, mask)
    return jnp.where(mask, jnp.exp(particles.log_weight - total), 0.0)


def effective_sample_size(particles: ParticleSet) -> Array:
    """ESS = 1 / sum(w_hat^2) (algorithm/effective_sample_size.hpp:46)."""
    w = normalized_weights(particles)
    return 1.0 / jnp.maximum(jnp.sum(w * w), 1e-38)
