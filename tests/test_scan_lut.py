"""Shared-scan likelihood LUT: accuracy vs the exact per-beam model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beluga_tpu.lie import SE2
from beluga_tpu.maps.occupancy import OCCUPIED_VALUE, make_grid
from beluga_tpu.models.sensor.likelihood_field import (
    LikelihoodFieldParams,
    likelihood_field_weights,
    make_likelihood_field,
)
from beluga_tpu.models.sensor.likelihood_field_lut import build_scan_lut, scan_lut_weights


@pytest.fixture(scope="module")
def setup():
    data = np.zeros((64, 64), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[25:30, 40:45] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)
    field = make_likelihood_field(LikelihoodFieldParams(max_laser_distance=5.0), grid)

    rng = np.random.default_rng(0)
    n_beams = 24
    angles = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    r = rng.uniform(0.5, 2.0, n_beams)
    points = jnp.asarray(np.stack([r * np.cos(angles), r * np.sin(angles)], -1), jnp.float32)
    mask = jnp.ones(n_beams, bool)
    return field, points, mask


def test_lut_matches_exact_model(setup):
    field, points, mask = setup
    # jit-compatible when the static footprint radius / resolution are given
    lut = jax.jit(
        lambda f, p, m: build_scan_lut(
            f, p, m, n_theta=256, max_point_radius=2.5, resolution_hint=0.1
        )
    )(field, points, mask)

    rng = np.random.default_rng(1)
    n = 400
    states = SE2.from_xytheta(
        jnp.asarray(rng.uniform(1.0, 5.4, n), jnp.float32),
        jnp.asarray(rng.uniform(1.0, 5.4, n), jnp.float32),
        jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32),
    )
    exact = np.asarray(likelihood_field_weights(field, states, points, mask))
    approx = np.asarray(scan_lut_weights(lut, states))

    # bounded approximation: bilinear + theta interpolation vs floor-cell
    rel = np.abs(approx - exact) / np.abs(exact)
    assert np.median(rel) < 0.08, f"median rel err {np.median(rel):.3f}"
    assert np.corrcoef(exact, approx)[0, 1] > 0.9
    # ranking near the peak is what drives resampling: the top-decile sets
    # of the exact and LUT scores must substantially overlap
    k = len(exact) // 10
    top_exact = set(np.argsort(exact)[-k:])
    top_lut = set(np.argsort(approx)[-k:])
    overlap = len(top_exact & top_lut) / k
    assert overlap > 0.6, f"top-decile overlap {overlap:.2f}"


def test_lut_out_of_map_poses_finite(setup):
    field, points, mask = setup
    lut = build_scan_lut(field, points, mask, n_theta=64)
    states = SE2.from_xytheta(
        jnp.asarray([-3.0, 50.0]), jnp.asarray([-3.0, 50.0]), jnp.zeros(2)
    )
    w = np.asarray(scan_lut_weights(lut, states))
    assert np.isfinite(w).all()
    assert (w >= 1.0).all()


def test_lut_theta_wraps(setup):
    field, points, mask = setup
    lut = build_scan_lut(field, points, mask, n_theta=64)
    a = SE2.from_xytheta(jnp.asarray([3.0]), jnp.asarray([3.0]), jnp.asarray([np.pi - 1e-4]))
    b = SE2.from_xytheta(jnp.asarray([3.0]), jnp.asarray([3.0]), jnp.asarray([-np.pi + 1e-4]))
    wa = float(scan_lut_weights(lut, a)[0])
    wb = float(scan_lut_weights(lut, b)[0])
    assert wa == pytest.approx(wb, rel=0.05)


def test_shared_scan_fleet_filter():
    """Fleet of filters sharing one scan through the LUT path: the shared
    update tracks like the exact per-beam update."""
    import functools

    from beluga_tpu.core.random import sample_normal_se2
    from beluga_tpu.filters.amcl import AmclParams, init_state, update
    from beluga_tpu.filters.builders import (
        make_likelihood_field_filter,
        make_shared_scan_filter,
    )

    data = np.zeros((64, 64), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    data[25:30, 40:45] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)

    models, ctx, prepare = make_shared_scan_filter(
        grid, LikelihoodFieldParams(max_laser_distance=5.0),
        n_theta=64, max_point_radius=2.5,
    )
    params = AmclParams(max_particles=256, min_particles=64)

    rng = np.random.default_rng(2)
    n_beams = 24
    angles = np.linspace(-np.pi, np.pi, n_beams, endpoint=False)
    r = rng.uniform(0.5, 2.0, n_beams)
    points = jnp.asarray(
        np.stack([r * np.cos(angles), r * np.sin(angles)], -1), jnp.float32
    )
    mask = jnp.ones(n_beams, bool)

    # one shared LUT for the whole fleet
    sctx = prepare(ctx, points, mask)

    def one(key):
        k1, k2 = jax.random.split(key)
        states = sample_normal_se2(
            k1, 256, SE2.from_xytheta(3.2, 3.2, 0.0), jnp.eye(3) * 0.2
        )
        return init_state(k2, states, params)

    batch = 4
    fleet = jax.vmap(one)(jax.random.split(jax.random.PRNGKey(0), batch))
    step = jax.vmap(
        functools.partial(update, params, models), in_axes=(None, 0, 0, None, None)
    )
    odoms = SE2.from_xytheta(jnp.full(batch, 0.3), jnp.zeros(batch), jnp.zeros(batch))
    fleet, est = jax.jit(step)(sctx, fleet, odoms, points, mask)
    assert bool(np.asarray(est.valid).all())
    assert np.isfinite(np.asarray(est.pose.xy)).all()
    # all filters see the same scan from the same prior -> estimates agree
    xs = np.asarray(est.pose.x)
    assert xs.std() < 0.5


def test_pallas_build_matches_roll_build(setup):
    """The VMEM kernel reproduces the XLA roll build on the core region
    (outside the core, wraps traverse differently-sized unknown bands)."""
    from beluga_tpu.models.sensor.likelihood_field_lut import build_scan_lut_pallas

    field, points, mask = setup
    a = build_scan_lut(field, points, mask, n_theta=16, max_point_radius=2.5)
    b = build_scan_lut_pallas(
        field, points, mask, n_theta=16, max_point_radius=2.5, interpret=True
    )
    assert a.pad_cells == b.pad_cells
    assert b.values.shape[1] % 8 == 0 and b.values.shape[2] % 128 == 0
    pad = a.pad_cells
    h, w = field.values.shape
    core_a = np.asarray(a.values[:, pad : pad + h, pad : pad + w])
    core_b = np.asarray(b.values[:, pad : pad + h, pad : pad + w])
    np.testing.assert_allclose(core_b, core_a, rtol=1e-5, atol=1e-6)


def test_pallas_build_nearest_sampling(setup):
    """Nearest sampling keeps the LUT usable against the exact model:
    same accuracy gates as the bilinear LUT (the ≤ half-cell sampling
    error is below the heading-quantization error at realistic K)."""
    from beluga_tpu.models.sensor.likelihood_field_lut import build_scan_lut_pallas

    field, points, mask = setup
    lut = build_scan_lut_pallas(
        field, points, mask, n_theta=256, max_point_radius=2.5,
        resolution_hint=0.1, sampling="nearest", interpret=True,
    )
    rng = np.random.default_rng(7)
    n = 400
    states = SE2.from_xytheta(
        jnp.asarray(rng.uniform(1.0, 5.4, n), jnp.float32),
        jnp.asarray(rng.uniform(1.0, 5.4, n), jnp.float32),
        jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32),
    )
    exact = np.asarray(likelihood_field_weights(field, states, points, mask))
    approx = np.asarray(scan_lut_weights(lut, states))
    assert np.isfinite(approx).all()
    rel = np.abs(approx - exact) / np.abs(exact)
    assert np.median(rel) < 0.1, f"median rel err {np.median(rel):.3f}"
    k = n // 10
    overlap = len(set(np.argsort(exact)[-k:]) & set(np.argsort(approx)[-k:])) / k
    assert overlap > 0.6, f"top-decile overlap {overlap:.2f}"


def test_pallas_build_downsampled(setup):
    """downsample=2 builds a coarser LUT that still tracks the exact model."""
    from beluga_tpu.models.sensor.likelihood_field_lut import build_scan_lut_pallas

    field, points, mask = setup
    lut = build_scan_lut_pallas(
        field, points, mask, n_theta=256, max_point_radius=2.5,
        resolution_hint=0.1, downsample=2, interpret=True,
    )
    rng = np.random.default_rng(9)
    n = 400
    states = SE2.from_xytheta(
        jnp.asarray(rng.uniform(1.0, 5.4, n), jnp.float32),
        jnp.asarray(rng.uniform(1.0, 5.4, n), jnp.float32),
        jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32),
    )
    exact = np.asarray(likelihood_field_weights(field, states, points, mask))
    approx = np.asarray(scan_lut_weights(lut, states))
    assert np.isfinite(approx).all()
    rel = np.abs(approx - exact) / np.abs(exact)
    assert np.median(rel) < 0.15, f"median rel err {np.median(rel):.3f}"
    k = n // 10
    overlap = len(set(np.argsort(exact)[-k:]) & set(np.argsort(approx)[-k:])) / k
    assert overlap > 0.5, f"top-decile overlap {overlap:.2f}"


def test_pallas_build_masked_beams(setup):
    from beluga_tpu.models.sensor.likelihood_field_lut import build_scan_lut_pallas

    field, points, mask = setup
    half = jnp.asarray(np.arange(points.shape[0]) % 2 == 0)
    a = build_scan_lut(field, points, half, n_theta=8, max_point_radius=2.5)
    b = build_scan_lut_pallas(
        field, points, half, n_theta=8, max_point_radius=2.5, interpret=True
    )
    pad = a.pad_cells
    h, w = field.values.shape
    np.testing.assert_allclose(
        np.asarray(b.values[:, pad : pad + h, pad : pad + w]),
        np.asarray(a.values[:, pad : pad + h, pad : pad + w]),
        rtol=1e-5, atol=1e-6,
    )


def test_shared_scan_filter_pallas_build():
    """lut_build="pallas" is a drop-in for the shared-scan builder."""
    from beluga_tpu.filters.builders import make_shared_scan_filter

    data = np.zeros((64, 64), np.int8)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = OCCUPIED_VALUE
    grid = make_grid(data, 0.1)
    models, ctx, prepare = make_shared_scan_filter(
        grid, LikelihoodFieldParams(max_laser_distance=5.0),
        n_theta=16, max_point_radius=2.5, lut_build="pallas",
    )
    angles = np.linspace(-np.pi, np.pi, 12, endpoint=False)
    points = jnp.asarray(
        np.stack([np.cos(angles), np.sin(angles)], -1), jnp.float32
    )
    mask = jnp.ones(12, bool)
    sctx = prepare(ctx, points, mask)
    states = SE2.from_xytheta(jnp.asarray([3.0]), jnp.asarray([3.0]), jnp.asarray([0.0]))
    w = np.asarray(jnp.exp(models.log_weight(sctx, states, points, mask)))
    assert np.isfinite(w).all() and (w >= 1.0).all()


def test_fft_build_matches_shift_build(setup):
    from beluga_tpu.models.sensor.likelihood_field_lut import build_scan_lut_fft

    field, points, mask = setup
    a = build_scan_lut(field, points, mask, n_theta=32, max_point_radius=2.5)
    b = build_scan_lut_fft(field, points, mask, n_theta=32, max_point_radius=2.5)
    assert a.values.shape == b.values.shape
    va = np.asarray(a.values)
    vb = np.asarray(b.values)
    # different interpolants (bilinear vs periodic sinc): compare loosely
    scale = np.abs(va).max()
    assert np.median(np.abs(va - vb)) < 0.05 * scale
    assert np.corrcoef(va.ravel(), vb.ravel())[0, 1] > 0.99


def test_fft_lut_matches_exact_model(setup):
    from beluga_tpu.models.sensor.likelihood_field_lut import build_scan_lut_fft

    field, points, mask = setup
    lut = build_scan_lut_fft(field, points, mask, n_theta=256, max_point_radius=2.5)
    rng = np.random.default_rng(5)
    n = 300
    states = SE2.from_xytheta(
        jnp.asarray(rng.uniform(1.0, 5.4, n), jnp.float32),
        jnp.asarray(rng.uniform(1.0, 5.4, n), jnp.float32),
        jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32),
    )
    exact = np.asarray(likelihood_field_weights(field, states, points, mask))
    approx = np.asarray(scan_lut_weights(lut, states))
    rel = np.abs(approx - exact) / np.abs(exact)
    assert np.median(rel) < 0.1
    k = n // 10
    overlap = len(
        set(np.argsort(exact)[-k:]) & set(np.argsort(approx)[-k:])
    ) / k
    assert overlap > 0.5
