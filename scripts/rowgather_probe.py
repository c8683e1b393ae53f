"""Probe: packed-row gather rate vs element dtype at the PRODUCTION shape.

Round-3 profiling (ARCHITECTURE.md "Remaining headroom") found the packed
serving hop's u8 row gather ([Q] rows x 8 KB) running at ~75 GB/s (~9% of
HBM). Hypothesis (a): the same bytes gathered as int32 [rows, row_w/4]
avoid the sublane-packed u8 layout and run near the f32 row-gather rate.

Method: ITERS gathers inside ONE jitted fori_loop (ids rotated per iter so
nothing CSEs; the gathered rows are folded into a live accumulator), then
one element fetched D2H — block_until_ready alone under-reports on the
tunneled axon backend (bench.py _sync_fetch note).

Tables are built ON DEVICE (no host transfer — a 1.6 GB host table takes
~45 s through the tunnel). NO u8 bitcasts anywhere (hangs the axon
backend, commit c35b0e8).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
ROW_B = int(sys.argv[3]) if len(sys.argv) > 3 else 8192  # bytes per row
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 64

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, N, (Q,)).astype(np.int32))
print(f"device={jax.devices()[0]} N={N} Q={Q} row={ROW_B}B iters={ITERS} "
      f"bytes/gather={Q*ROW_B/1e6:.1f} MB", flush=True)


@functools.partial(jax.jit, static_argnames=("shape_w", "kind"))
def fill(shape_w, kind):
    r = jnp.arange(N, dtype=jnp.int32)[:, None]
    c = jnp.arange(shape_w, dtype=jnp.int32)[None, :]
    v = (r * 1315423911 + c * 1654435761) & 0x7FFFFFFF
    if kind == "u8":
        return (v & 0xFF).astype(jnp.uint8)
    if kind == "i32":
        return v
    return v.astype(jnp.float32) * 1e-9


def bench(name, tab, reduce_f32=False):
    acc0 = jnp.zeros((tab.shape[1],),
                     jnp.float32 if reduce_f32 else tab.dtype)

    @jax.jit
    def loop(t, i0, acc):
        def body(it, carry):
            acc, = carry
            idx = (i0 + it) % N          # rotate ids: no CSE across iters
            rows = t[idx]                # [Q, w]
            if reduce_f32:
                acc = acc + jnp.sum(rows.astype(jnp.float32), axis=0)
            else:
                acc = acc + jnp.max(rows, axis=0)
            return (acc,)
        return jax.lax.fori_loop(0, ITERS, body, (acc,))[0]

    out = loop(tab, ids, acc0)
    np.asarray(out[:1])  # warm + honest sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(tab, ids, acc0)
        np.asarray(out[:1])
        ts.append(time.perf_counter() - t0)
    per = float(np.min(ts)) / ITERS
    gbps = Q * ROW_B / per / 1e9
    print(f"{name:28s} {per*1e3:8.3f} ms/gather  ({gbps:7.1f} GB/s)",
          flush=True)


for name, w, kind in [
        (f"u8  [N,{ROW_B}]", ROW_B, "u8"),
        (f"i32 [N,{ROW_B//4}]", ROW_B // 4, "i32"),
        (f"f32 [N,{ROW_B//4}]", ROW_B // 4, "f32"),
]:
    tab = jax.block_until_ready(fill(w, kind))
    bench(name, tab)
    del tab
