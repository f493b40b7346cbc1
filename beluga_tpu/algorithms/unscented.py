"""Unscented transform (sigma-point propagation of mean and covariance).

Port of ``algorithm/unscented_transform.hpp:86-148``: 2n+1 sigma points with
``w0 = k/(n+k)``, ``wi = 1/(2(n+k))``, ``k = max(n-3, 0)`` by default,
Cholesky-scaled offsets, optional custom mean/residual callables (for
manifold outputs such as angles).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def unscented_transform(
    mean: Array,
    covariance: Array,
    transfer_fn: Callable[[Array], Array],
    kappa: float | None = None,
    mean_fn: Callable | None = None,
    residual_fn: Callable | None = None,
):
    """Propagate (mean [n], covariance [n, n]) through ``transfer_fn``.

    ``transfer_fn`` maps a batch of sigma points ``[2n+1, n] -> [2n+1, m]``
    (vectorized, unlike the reference's per-point callable).
    Returns ``(out_mean [m], out_cov [m, m])``.
    """
    n = mean.shape[-1]
    k = float(max(n - 3, 0)) if kappa is None else float(kappa)
    w0 = k / (n + k) if (n + k) > 0 else 0.0
    wn = 1.0 / (2.0 * (n + k))
    weights = jnp.concatenate(
        [jnp.asarray([w0], mean.dtype), jnp.full((2 * n,), wn, mean.dtype)]
    )

    l_matrix = jnp.linalg.cholesky(covariance)
    scaled = jnp.sqrt(jnp.asarray(n + k, mean.dtype)) * l_matrix  # [n, n]
    offsets = jnp.concatenate([scaled.T, -scaled.T], axis=0)  # [2n, n]
    sigma_points = jnp.concatenate([mean[None, :], mean[None, :] + offsets], axis=0)

    transformed = transfer_fn(sigma_points)  # [2n+1, m]

    if mean_fn is None:
        out_mean = jnp.einsum("s,sm->m", weights, transformed)
    else:
        out_mean = mean_fn(transformed, weights)

    if residual_fn is None:
        err = transformed - out_mean[None, :]
    else:
        err = residual_fn(transformed, out_mean[None, :])
    out_cov = jnp.einsum("s,sm,sk->mk", weights, err, err)
    return out_mean, out_cov
