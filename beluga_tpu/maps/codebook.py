"""Closed-form value codebook for likelihood fields.

The likelihood field (sensor/likelihood_field_model_base.hpp:181-184)
takes very few distinct values: the exact EDT produces squared distances
``j * resolution**2`` with integer ``j = a**2 + b**2`` (a sum of two
squares, by construction of the separable transform), the Gaussian
``amplitude * exp(-d2 / 2 sigma**2) + offset`` underflows to exactly
``offset`` (in f32) beyond a few hundred cell**2, and the only other
values are the ``max_obstacle_distance`` clip and the unknown-space
overlay.  For production parameters that is < 256 distinct f32 values, so
the field can be stored as 8-bit codes + a 256-entry codebook with ZERO
reconstruction error — and code lookup runs as a single bf16 one-hot MXU
pass (small integers are exact in bf16), ~2x the 3-pass f32 trick at
*better* accuracy (see ops/gather2d.py::_codebook_lookup).

The proposal below is computed on host from (params, resolution) alone —
no device readback (NOTES.md: readbacks switch remote sessions to
synchronous mode).  Device-side nearest assignment (encode_table) absorbs
any 1-ulp exp() differences between host and device.
"""

from __future__ import annotations

import numpy as np

MAX_CODES = 256


def _f32(x):
    return np.float32(x)


def likelihood_field_codebook(
    params, resolution: float, max_codes: int = MAX_CODES
) -> np.ndarray:
    """Sorted f32 codebook of the possible likelihood-field values.

    ``params`` is a LikelihoodFieldParams; ``resolution`` the grid cell
    size in meters.  If the analytic value set exceeds ``max_codes``,
    nearest-neighbor values are merged (error = half the largest merged
    gap, tiny because values cluster exponentially near ``offset``).
    """
    res2 = _f32(resolution) * _f32(resolution)
    tss = _f32(2.0) * _f32(params.sigma_hit) * _f32(params.sigma_hit)
    amplitude = _f32(
        params.z_hit / (params.sigma_hit * np.sqrt(2.0 * np.pi))
    )
    offset = _f32(params.z_random / params.max_laser_distance)

    def value(d2):
        return _f32(
            amplitude * np.exp(-(_f32(d2) / tss), dtype=np.float32) + offset
        )

    max_d2_cells = _f32(params.max_obstacle_distance / resolution) ** 2

    values = {value(_f32(0.0)), offset, value(max_d2_cells * res2)}
    # enumerate representable squared cell distances a^2 + b^2
    jmax = int(min(max_d2_cells, 4 * max_codes * max_codes)) + 1
    amax = int(np.sqrt(jmax)) + 1
    sums = np.unique(
        (np.arange(amax)[:, None] ** 2 + np.arange(amax)[None, :] ** 2).ravel()
    )
    sums = sums[sums <= jmax].astype(np.float64)
    d2s = np.minimum(sums, max_d2_cells) * res2
    vals = (amplitude * np.exp(-(d2s.astype(np.float32) / tss)) + offset).astype(
        np.float32
    )
    values.update(vals.tolist())

    if params.model_unknown_space:
        # unknown cells read exactly 1/max_laser_distance through
        # min(max_obstacle_distance^2, squared_background_distance)
        inv_max = _f32(1.0 / params.max_laser_distance)
        bgd2 = _f32(-tss * np.log((inv_max - offset) / amplitude))
        bgd2 = min(_f32(max_d2_cells * res2), bgd2)
        values.add(value(bgd2))

    book = np.array(sorted(values), np.float32)
    while book.size > max_codes:
        gaps = np.diff(book)
        k = int(np.argmin(gaps))
        merged = np.float32(0.5 * (float(book[k]) + float(book[k + 1])))
        book = np.concatenate([book[:k], [merged], book[k + 2:]])
    if book.size < max_codes:
        book = np.concatenate(
            [book, np.full(max_codes - book.size, book[-1], np.float32)]
        )
    return book
