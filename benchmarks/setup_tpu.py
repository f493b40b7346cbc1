"""Interactive TPU experiment session (run with `python -i`).

Pays the one-off synchronous-mode switch (see NOTES.md: a single
device_get flips the remote relay into synchronous execution, after which
wall-clock timings are hardware-true), then exposes `timeit(fn, *args)`
for honest measurements.  Keep ONE of these alive per work session —
the switch costs minutes.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

print("devices:", jax.devices(), flush=True)


def timeit(fn, *args, iters=10, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{dt*1e3:.3f} ms/iter", flush=True)
    return dt


# --- deception probe + sync switch ---------------------------------------
m = 4096
a = jnp.asarray(np.random.default_rng(0).random((m, m)), jnp.float32)
f = jax.jit(lambda a: (a @ a).sum())
dt = timeit(f, a, iters=5)
flops = 2 * m**3 / dt
print(f"matmul {m}: {flops:.3e} FLOP/s (async if > 2.5e14)", flush=True)
if flops > 2.5e14:
    print("async mode detected; switching to synchronous (minutes)...", flush=True)
    t0 = time.perf_counter()
    jax.device_get(jnp.ones(2))
    print(f"sync switch took {time.perf_counter()-t0:.0f}s", flush=True)
    dt = timeit(f, a, iters=5)
    print(f"matmul {m} sync: {2*m**3/dt:.3e} FLOP/s", flush=True)

floor_fn = jax.jit(lambda a: a + 1.0)
floor = timeit(floor_fn, jnp.ones(8), iters=10)
print(f"roundtrip floor: {floor*1e3:.3f} ms", flush=True)
print("READY", flush=True)
