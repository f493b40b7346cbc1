"""Beam range-finder sensor model (Thrun table 6.2) with on-device raycast.

TPU re-design of ``sensor/beam_model.hpp:76-161``: the four-component
mixture (erf-normalized Gaussian hit, truncated-exponential short, max
return, uniform random) is evaluated for every (particle, beam) pair against
the expected range obtained by ray casting the particle's pose through the
occupancy grid.  The ``Σ pz³`` accumulation (seed 0.0) is a deliberate
nav2/AMCL parity quirk (beam_model.hpp:104-148).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OccupancyGrid
from beluga_tpu.ops.raycast import cast_rays

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BeamModelParams:
    """nav2-parity parameters (beam_model.hpp:43-58)."""

    z_hit: float = 0.5
    z_short: float = 0.5
    z_max: float = 0.05
    z_rand: float = 0.05
    sigma_hit: float = 0.2
    lambda_short: float = 0.1
    beam_max_range: float = 60.0


def beam_weights(
    params: BeamModelParams,
    grid: OccupancyGrid,
    states: SE2,
    points: Array,
    beam_mask: Array,
    resolution_hint: float | None = None,
    variant: str = "standard",
) -> Array:
    """AMCL-parity weights ``Σ_beams pz³`` per particle, ``f32[N]``.

    ``points`` are 2D hits in the particle/base frame (``f32[B, 2]``).
    ``variant`` selects the Bresenham variant for the ray march
    (``"standard"`` or ``"supercover"``, bresenham.hpp:37-41).
    """
    # measured range and bearing per beam (beam_model.hpp:116-121)
    z = jnp.linalg.norm(points, axis=-1)  # [B]
    safe_z = jnp.maximum(z, 1e-12)
    bearing = points / safe_z[..., None]  # unit vectors [B, 2]

    # ray sources/directions in the grid-local frame (raycasting.hpp:62-71,79-84)
    local = grid.origin.inverse() @ states  # SE2 [N]
    n = states.shape[0]
    b = points.shape[0]
    src = jnp.broadcast_to(local.xy[:, None, :], (n, b, 2))
    cos_l, sin_l = local.rot.cos[:, None], local.rot.sin[:, None]
    dx = cos_l * bearing[None, :, 0] - sin_l * bearing[None, :, 1]
    dy = sin_l * bearing[None, :, 0] + cos_l * bearing[None, :, 1]
    direction = jnp.stack([dx, dy], axis=-1)  # [N, B, 2]

    dist, hit = cast_rays(
        grid, src, direction, params.beam_max_range,
        resolution_hint=resolution_hint, variant=variant,
    )
    z_mean = jnp.where(hit, dist, params.beam_max_range)  # [N, B]

    # 1: hit component with erf normalization (beam_model.hpp:125-130)
    sqrt2 = jnp.sqrt(jnp.float32(2.0))
    n_const = 1.0 / (jnp.sqrt(2.0 * jnp.pi) * params.sigma_hit)
    eta_hit = 2.0 / (
        jax.lax.erf((params.beam_max_range - z_mean) / (sqrt2 * params.sigma_hit))
        - jax.lax.erf(-z_mean / (sqrt2 * params.sigma_hit))
    )
    d = (z[None, :] - z_mean) / params.sigma_hit
    pz = params.z_hit * eta_hit * n_const * jnp.exp(-0.5 * d * d)

    # 2: unexpected obstacles (beam_model.hpp:133-136)
    eta_short = 1.0 / (1.0 - jnp.exp(-params.lambda_short * z_mean))
    p_short = params.z_short * params.lambda_short * eta_short * jnp.exp(
        -params.lambda_short * z[None, :]
    )
    pz = pz + jnp.where(z[None, :] < z_mean, p_short, 0.0)

    # 3 & 4: max-range or random return (beam_model.hpp:139-143)
    pz = pz + jnp.where(
        z[None, :] < params.beam_max_range,
        params.z_rand / params.beam_max_range,
        params.z_max,
    )

    pz3 = pz * pz * pz
    return jnp.sum(jnp.where(beam_mask[None, :], pz3, 0.0), axis=-1)


def beam_log_weights(params, grid, states, points, beam_mask,
                     resolution_hint=None, variant="standard") -> Array:
    """Log of :func:`beam_weights` (clamped away from zero)."""
    return jnp.log(
        jnp.maximum(
            beam_weights(params, grid, states, points, beam_mask,
                         resolution_hint, variant=variant),
            1e-30,
        )
    )


def beam_sphere_trace_log_weights(
    params: BeamModelParams,
    dist_cells: Array,
    grid: OccupancyGrid,
    states: SE2,
    points: Array,
    beam_mask: Array,
    interpret: bool = False,
    march_steps: int | None = None,
) -> Array:
    """Approximate beam log-weights via the fused sphere-tracing kernel.

    Opt-in fast path (ops/pallas_beam.py): expected ranges come from
    sphere-tracing the EDT instead of the Bresenham march — no serialized
    gathers, no per-map LUT build; range error ~1 cell (well inside
    ``sigma_hit``).  ``dist_cells`` from
    :func:`beluga_tpu.ops.pallas_beam.make_distance_cells`.

    ``march_steps`` bounds the trace iterations; a beam that exhausts the
    budget scores max_range.  ``None`` keeps the kernel default (20) —
    long-range regimes (beam_max_range ≫ 10 m at cm cells) need more
    (make_beam_filter scales it with max_range / resolution).
    """
    from beluga_tpu.ops.pallas_beam import _STEPS, sphere_trace_beam_weights

    if march_steps is None:
        march_steps = _STEPS

    z = jnp.linalg.norm(points, axis=-1)
    bearing = points / jnp.maximum(z, 1e-12)[..., None]
    local = grid.origin.inverse() @ states
    pv = jnp.asarray(
        [params.beam_max_range, params.z_hit, params.z_short, params.z_max,
         params.z_rand, params.sigma_hit, params.lambda_short], jnp.float32
    )
    w = sphere_trace_beam_weights(
        dist_cells, local.x, local.y, local.rot.cos, local.rot.sin,
        bearing, z, beam_mask, grid.resolution, pv, interpret=interpret,
        march_steps=march_steps,
    )
    return jnp.log(jnp.maximum(w, 1e-30))
