"""Gather-engine throughput vs row dtype/width on TPU.

The PQ candidate fetch gathers [N, m]-uint8 rows; measured 6x slower than
the flat path's [N, 128]-f32 rows despite moving 32x fewer bytes. This
sweeps layouts to find how code rows should be stored for gathers.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

Q = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
N = 1_000_000

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, N, (Q, K)).astype(np.int32))
print(f"device={jax.devices()[0].platform} Q={Q} K={K} rows/call={Q*K}")


def timeit(name, tab):
    g = jax.jit(lambda t, i: t[i])
    out = g(tab, ids)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(g(tab, ids))
        ts.append(time.perf_counter() - t0)
    ms = np.median(ts) * 1e3
    rate = Q * K / (np.median(ts)) / 1e6
    print(f"{name:24s} {ms:8.2f} ms  ({rate:6.1f}M rows/s)")


for w, dt in [(16, np.uint8), (32, np.uint8), (128, np.uint8),
              (4, np.int32), (16, np.int32), (32, np.int32),
              (4, np.float32), (16, np.float32), (32, np.float32),
              (128, np.float32)]:
    if np.issubdtype(dt, np.integer) and dt == np.uint8:
        tab = jnp.asarray(rng.integers(0, 256, (N, w)).astype(dt))
    elif dt == np.int32:
        tab = jnp.asarray(rng.integers(0, 2**30, (N, w)).astype(dt))
    else:
        tab = jnp.asarray(rng.standard_normal((N, w)).astype(dt))
    timeit(f"[N,{w:4d}] {np.dtype(dt).name}", tab)
    del tab
