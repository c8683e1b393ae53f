"""Probe: XLA row-gather rate vs row WIDTH at fixed row count — find the
knee where the per-row cost jumps from ~11 ns (512 B rows, 90 M rows/s,
prior gather_bench) to ~108 ns (8 KB rows, production). Identical fused
consume everywhere (f32 sum over the row axis) so dtypes compare honestly.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 200_000
Q = 8192
ITERS = 64

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, N, (Q,)).astype(np.int32))
print(f"device={jax.devices()[0]} N={N} Q={Q} iters={ITERS}", flush=True)


@functools.partial(jax.jit, static_argnames=("w", "kind"))
def fill(w, kind):
    r = jnp.arange(N, dtype=jnp.int32)[:, None]
    c = jnp.arange(w, dtype=jnp.int32)[None, :]
    v = (r * 1315423911 + c * 1654435761) & 0x7FFFFFFF
    if kind == "u8":
        return (v & 0xFF).astype(jnp.uint8)
    return v


def bench(name, tab, row_b):
    @jax.jit
    def loop(t, i0):
        def body(it, carry):
            acc, = carry
            rows = t[(i0 + it) % N]                       # [Q, w]
            acc = acc + jnp.sum(rows.astype(jnp.float32), axis=0)
            return (acc,)
        acc0 = jnp.zeros((t.shape[1],), jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, (acc0,))[0]

    np.asarray(loop(tab, ids)[:1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(tab, ids)
        np.asarray(out[:1])
        ts.append(time.perf_counter() - t0)
    per = float(np.min(ts)) / ITERS
    print(f"{name:22s} {per*1e3:8.3f} ms  ({Q*row_b/per/1e9:6.1f} GB/s, "
          f"{Q/per/1e6:6.2f} M rows/s, {per/Q*1e9:6.1f} ns/row)", flush=True)


for kind, w in [("u8", 512), ("u8", 1024), ("u8", 2048), ("u8", 4096),
                ("u8", 8192),
                ("i32", 128), ("i32", 256), ("i32", 512), ("i32", 1024),
                ("i32", 2048)]:
    row_b = w if kind == "u8" else 4 * w
    tab = jax.block_until_ready(fill(w, kind))
    bench(f"{kind:3s} [N,{w:5d}] {row_b:5d}B", tab, row_b)
    del tab
