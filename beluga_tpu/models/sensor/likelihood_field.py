"""Likelihood-field range-finder sensor models (2D).

TPU re-design of the reference models:
  * field precompute — ``LikelihoodFieldModelBase::make_likelihood_field``
    (sensor/likelihood_field_model_base.hpp:130-185): distance transform →
    optional unknown-space overlay → per-cell Gaussian likelihood
    ``amplitude * exp(-d² / 2σ²) + offset``.
  * ``LikelihoodFieldModel`` weight (sensor/likelihood_field_model.hpp:68-91):
    per beam endpoint, transform into field frame, nearest-cell lookup (miss
    → 1 / max_laser_distance), accumulate ``1.0 + Σ pz³``.  The pz³ sum and
    the 1.0 seed are deliberate nav2/AMCL parity quirks — do not "fix" them.
  * ``LikelihoodFieldProbModel`` (likelihood_field_prob_model.hpp:68-90):
    same field, proper probability ``exp(Σ log pz)``.

Instead of evaluating one particle at a time, the weight function evaluates
the full ``[N particles] × [B beams]`` grid in one fused gather+reduce —
this is the hottest kernel of the 2D pipeline.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OccupancyGrid
from beluga_tpu.ops.distance_transform import squared_distance_transform

Array = jax.Array


def _dc(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@dataclasses.dataclass(frozen=True)
class LikelihoodFieldParams:
    """nav2-parity parameters (likelihood_field_model_base.hpp:42-64)."""

    max_obstacle_distance: float = 100.0
    max_laser_distance: float = 2.0
    z_hit: float = 0.5
    z_random: float = 0.5
    sigma_hit: float = 0.2
    model_unknown_space: bool = False
    only_obstacle_boundaries: bool = False


@_dc
class LikelihoodField:
    """Precomputed likelihood field (the reference's ``ValueGrid2<float>``)."""

    values: Array  # f32[H, W]
    resolution: Array  # f32 scalar
    world_to_field: SE2  # grid.origin().inverse()
    unknown_prob: Array  # f32 scalar: 1 / max_laser_distance


import functools


@functools.partial(jax.jit, static_argnums=(0,))
def make_likelihood_field(params: LikelihoodFieldParams, grid: OccupancyGrid) -> LikelihoodField:
    """Precompute the likelihood field from an occupancy grid.

    Port of likelihood_field_model_base.hpp:130-185 with the Dijkstra flood
    replaced by the exact separable EDT (see ops/distance_transform.py).
    Jitted (params static): the whole precompute is one compiled program —
    map loads dispatch a single executable instead of hundreds of eager ops.
    """
    two_squared_sigma = 2.0 * params.sigma_hit * params.sigma_hit
    amplitude = params.z_hit / (params.sigma_hit * jnp.sqrt(2.0 * jnp.pi))
    offset = params.z_random / params.max_laser_distance

    obstacle = (
        grid.obstacle_edge_mask() if params.only_obstacle_boundaries else grid.obstacle_mask
    )
    d2 = squared_distance_transform(obstacle, grid.resolution, params.max_obstacle_distance)

    if params.model_unknown_space:
        # Cells considered "unknown" read as 1/max_laser_distance exactly
        # (likelihood_field_model_base.hpp:160-179).
        inverse_max_distance = 1.0 / params.max_laser_distance
        squared_background_distance = -two_squared_sigma * jnp.log(
            (inverse_max_distance - offset) / amplitude
        )
        if params.only_obstacle_boundaries:
            effective_unknown = grid.unknown_mask | (
                grid.obstacle_mask & ~grid.obstacle_edge_mask()
            )
        else:
            effective_unknown = grid.unknown_mask
        bg = jnp.minimum(
            jnp.square(jnp.float32(params.max_obstacle_distance)), squared_background_distance
        )
        d2 = jnp.where(effective_unknown, bg, d2)

    values = (amplitude * jnp.exp(-d2 / two_squared_sigma) + offset).astype(jnp.float32)
    return LikelihoodField(
        values=values,
        # own buffer, not the grid's array object: passing the same jax.Array
        # twice in one jitted call interacts badly with argument pruning in
        # jax 0.9's jit fastpath (duplicate-argument dedup is inconsistent
        # between the first and subsequent calls)
        resolution=jnp.asarray(grid.resolution) * 1.0,
        world_to_field=grid.origin.inverse(),
        unknown_prob=jnp.float32(1.0 / params.max_laser_distance),
    )


def _field_lookup(field: LikelihoodField, states: SE2, points: Array, beam_mask: Array,
                  lookup_mode: str = "auto"):
    """Per-(particle, beam) field values ``f32[N, B]`` plus the beam mask.

    Transform beam endpoints (sensor points already in the particle/base
    frame) into the field frame and gather the nearest cell's likelihood,
    falling back to ``unknown_prob`` outside the map
    (likelihood_field_model.hpp:80-85).  ``lookup_mode`` selects the lookup
    implementation (see ops/gather2d.py): the MXU one-hot path lifts the
    gather-bound reweight by ~10x on TPU.
    """
    from beluga_tpu.ops.gather2d import table_lookup

    tf = field.world_to_field @ states  # SE2 [N]
    cos = tf.rot.cos[:, None]
    sin = tf.rot.sin[:, None]
    px, py = points[None, :, 0], points[None, :, 1]  # [1, B]
    x = px * cos - py * sin + tf.x[:, None]  # [N, B]
    y = px * sin + py * cos + tf.y[:, None]

    h, w = field.values.shape
    xi = jnp.floor(x / field.resolution).astype(jnp.int32)
    yi = jnp.floor(y / field.resolution).astype(jnp.int32)
    inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    vals = table_lookup(field.values, yi, xi, mode=lookup_mode)
    pz = jnp.where(inside, vals, field.unknown_prob)
    return pz, beam_mask[None, :]


def likelihood_field_weights(
    field: LikelihoodField, states: SE2, points: Array, beam_mask: Array,
    lookup_mode: str = "auto",
) -> Array:
    """AMCL-parity weights ``1.0 + Σ_beams pz³`` per particle ``f32[N]``.

    Port of likelihood_field_model.hpp:68-91 (including the pz³ / 1.0-seed
    quirks shared with nav2_amcl and QuickMCL).
    """
    pz, m = _field_lookup(field, states, points, beam_mask, lookup_mode)
    return 1.0 + jnp.sum(jnp.where(m, pz * pz * pz, 0.0), axis=-1)


def likelihood_field_weights_lowrank(
    field: LikelihoodField,
    factors: tuple[Array, Array],
    states: SE2,
    points: Array,
    beam_mask: Array,
) -> Array:
    """Approximate AMCL-parity weights via an SVD-factored field.

    ``factors = (U·s [H, r], V [W, r])`` from
    :func:`beluga_tpu.ops.gather2d.factorize_table`.  Lookup cost drops from
    ``H·W`` to ``(H+W)·r`` MACs per beam (~6x on TPU at r=32-48) at the cost
    of the truncated singular mass — likelihood fields are Gaussian-smooth
    and compress well (error bounds tested).  Opt-in fast path; parity
    tests always use the exact modes.
    """
    from beluga_tpu.ops.gather2d import _lowrank_lookup

    tf = field.world_to_field @ states
    cos = tf.rot.cos[:, None]
    sin = tf.rot.sin[:, None]
    px, py = points[None, :, 0], points[None, :, 1]
    x = px * cos - py * sin + tf.x[:, None]
    y = px * sin + py * cos + tf.y[:, None]
    h, w = field.values.shape
    xi = jnp.floor(x / field.resolution).astype(jnp.int32)
    yi = jnp.floor(y / field.resolution).astype(jnp.int32)
    inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    u, v = factors
    vals = _lowrank_lookup(u, v, yi, xi)
    pz = jnp.where(inside, vals, field.unknown_prob)
    pz = jnp.maximum(pz, 0.0)  # truncation can produce tiny negatives
    return 1.0 + jnp.sum(jnp.where(beam_mask[None, :], pz**3, 0.0), axis=-1)


def likelihood_field_weights_codebook(
    field: LikelihoodField,
    codes_book: tuple[Array, Array],
    states: SE2,
    points: Array,
    beam_mask: Array,
    values3: Array | None = None,
) -> Array:
    """AMCL-parity weights through the code-table fast path.

    ``codes_book = (codes i32[H, W], codebook f32[256])`` built at map load
    (maps/codebook.py + ops/gather2d.py::encode_table).  Exact when the
    field has <= 256 distinct values (true for production parameters);
    otherwise error = codebook quantization (far below the 3-pass one-hot
    tolerance).  On TPU the lookup runs as the fused Pallas kernel
    (ops/pallas_lookup.py, 5.8e8 lookups/s measured on v5e = 86% of the
    bf16 MXU — the XLA scan caps at 3.1e8 on HBM traffic); elsewhere the
    XLA scan formulation.
    """
    from beluga_tpu.ops.gather2d import _codebook_lookup

    codes, book = codes_book
    tf = field.world_to_field @ states
    if jax.default_backend() == "tpu":
        # one kernel for transform + lookup + decode + pz^3 reduce — the
        # only HBM traffic is 16 B in / 4 B out per particle.  Weight
        # differs from the XLA path only in the f32 beam-sum order (~1e-5).
        from beluga_tpu.ops.pallas_reweight import fused_reweight

        return fused_reweight(
            codes, book, tf.x, tf.y, tf.rot.cos, tf.rot.sin,
            points, beam_mask, field.resolution, field.unknown_prob,
            values3=values3,
        )
    cos = tf.rot.cos[:, None]
    sin = tf.rot.sin[:, None]
    px, py = points[None, :, 0], points[None, :, 1]
    x = px * cos - py * sin + tf.x[:, None]
    y = px * sin + py * cos + tf.y[:, None]
    h, w = field.values.shape
    xi = jnp.floor(x / field.resolution).astype(jnp.int32)
    yi = jnp.floor(y / field.resolution).astype(jnp.int32)
    inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    vals = _codebook_lookup(codes, book, yi, xi)
    pz = jnp.where(inside, vals, field.unknown_prob)
    return 1.0 + jnp.sum(jnp.where(beam_mask[None, :], pz * pz * pz, 0.0), axis=-1)


def likelihood_field_prob_weights(
    field: LikelihoodField, states: SE2, points: Array, beam_mask: Array,
    lookup_mode: str = "auto", codes_book=None, values3=None,
) -> Array:
    """Proper-probability weights ``exp(Σ log pz)``
    (likelihood_field_prob_model.hpp:68-90).  Returned in *log* space to
    avoid overflow; callers add it to log-weights directly.

    With ``codes_book`` on TPU the fused Pallas kernel runs in log-space
    (ops/pallas_reweight.py ``log_space=True``); ``values3`` (a log-pz
    table from ``build_values3(..., log_space=True)``) additionally
    enables the per-beam-window fast path.
    """
    if codes_book is not None and jax.default_backend() == "tpu":
        from beluga_tpu.ops.pallas_reweight import fused_reweight

        codes, book = codes_book
        tf = field.world_to_field @ states
        return fused_reweight(
            codes, book, tf.x, tf.y, tf.rot.cos, tf.rot.sin,
            points, beam_mask, field.resolution, field.unknown_prob,
            values3=values3, log_space=True,
        )
    pz, m = _field_lookup(field, states, points, beam_mask, lookup_mode)
    return jnp.sum(jnp.where(m, jnp.log(pz), 0.0), axis=-1)
