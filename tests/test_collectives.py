"""shard_map collectives layer tests on the 8-device virtual mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from beluga_tpu.parallel.collectives import (
    sharded_cdf,
    sharded_effective_sample_size,
    sharded_logsumexp,
    sharded_mean,
    sharded_normalize,
    sharded_systematic_resample,
)

shard_map = jax.shard_map


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()), ("tp",))


N = 512  # global particle count; 64 per shard


def test_sharded_logsumexp_matches_dense(mesh):
    rng = np.random.default_rng(0)
    log_w = jnp.asarray(rng.normal(0, 2, N), jnp.float32)
    mask = jnp.asarray(rng.random(N) < 0.8)

    f = shard_map(
        functools.partial(sharded_logsumexp, axis_name="tp"),
        mesh=mesh,
        in_specs=(P("tp"), P("tp")),
        out_specs=P(),
    )
    got = f(log_w, mask)
    want = jax.scipy.special.logsumexp(jnp.where(mask, log_w, -jnp.inf))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sharded_normalize_sums_to_one(mesh):
    rng = np.random.default_rng(1)
    log_w = jnp.asarray(rng.normal(0, 1, N), jnp.float32)
    mask = jnp.ones(N, bool)
    f = shard_map(
        functools.partial(sharded_normalize, axis_name="tp"),
        mesh=mesh,
        in_specs=(P("tp"), P("tp")),
        out_specs=P("tp"),
    )
    out = f(log_w, mask)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(), 1.0, rtol=1e-5)


def test_sharded_ess_matches_dense(mesh):
    rng = np.random.default_rng(2)
    log_w = jnp.asarray(rng.normal(0, 1, N), jnp.float32)
    mask = jnp.ones(N, bool)
    f = shard_map(
        functools.partial(sharded_effective_sample_size, axis_name="tp"),
        mesh=mesh,
        in_specs=(P("tp"), P("tp")),
        out_specs=P(),
    )
    w = np.exp(np.asarray(log_w))
    w = w / w.sum()
    np.testing.assert_allclose(f(log_w, mask), 1.0 / np.sum(w * w), rtol=1e-4)


def test_sharded_cdf_global_monotone(mesh):
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.random(N), jnp.float32)

    def body(w):
        local, off = sharded_cdf(w, "tp")
        return local + off

    f = shard_map(body, mesh=mesh, in_specs=(P("tp"),), out_specs=P("tp"))
    cdf = np.asarray(f(w))
    ref = np.cumsum(np.asarray(w)) / np.asarray(w).sum()
    np.testing.assert_allclose(cdf, ref, rtol=1e-4)


def test_sharded_systematic_matches_dense(mesh):
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.random(N).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def body(w):
        gidx, shard = sharded_systematic_resample(key, w, "tp", num_shards=8)
        return gidx

    f = shard_map(body, mesh=mesh, in_specs=(P("tp"),), out_specs=P("tp"))
    got = np.asarray(f(w))

    # dense reference with the same u0
    u0 = float(jax.random.uniform(key, (), jnp.float32))
    cdf = np.cumsum(np.asarray(w)) / np.asarray(w).sum()
    u = (np.arange(N) + u0) / N
    want = np.clip(np.searchsorted(cdf, u, side="right"), 0, N - 1)
    np.testing.assert_array_equal(got, want)


def test_sharded_mean(mesh):
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32)
    w = jnp.asarray(rng.random(N), jnp.float32)
    f = shard_map(
        functools.partial(sharded_mean, axis_name="tp"),
        mesh=mesh,
        in_specs=(P("tp"), P("tp")),
        out_specs=P(),
    )
    want = (np.asarray(w)[:, None] * np.asarray(v)).sum(0) / np.asarray(w).sum()
    np.testing.assert_allclose(f(v, w), want, rtol=1e-4, atol=1e-5)
