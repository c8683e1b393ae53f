"""Probe: is 77.6 ns/row the v5e gather engine's issue bound, or is there
headroom at the production packed-words shape? (VERDICT r4 item 3.)

Round 4 measured the production gather — [Q=8192 rows, 2048 i32 words]
(8 KB rows, words layout) — at 77.6 ns/row = 105.6 GB/s, ~13 % of HBM.
This probe varies the gather SHAPE at fixed total bytes per gather to
attribute the bound:

  * rows vs width at fixed bytes  — if ns/row stays flat as width shrinks
    (GB/s falling proportionally), the engine is row-issue-bound; if GB/s
    stays flat, it is bandwidth/stride-bound.
  * sorted vs random ids          — locality sensitivity (page/bank).
  * one gather vs two half-gathers — do independent gathers overlap?
  * Q=16384 vs Q=8192             — does deeper row pipelining help?

Honest timing per the repo rule: ITERS gathers inside ONE jitted
fori_loop, ids rotated per iteration, consumed into a live f32 accumulator,
one element fetched D2H (block_until_ready lies on the axon tunnel).
Tables are built on device; total table size held near 1.6 GB by scaling N
with row width.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 64
TABLE_B = 1_638_400_000  # ~1.6 GB tables, N scaled by row width

rng = np.random.default_rng(0)
print(f"device={jax.devices()[0]} iters={ITERS}", flush=True)


@functools.partial(jax.jit, static_argnames=("n", "w"))
def fill(n, w):
    r = jnp.arange(n, dtype=jnp.int32)[:, None]
    c = jnp.arange(w, dtype=jnp.int32)[None, :]
    return (r * 1315423911 + c * 1654435761) & 0x7FFFFFFF


def run(name, q, w, sort_ids=False, split=1):
    n = TABLE_B // (4 * w)
    ids_np = rng.integers(0, n, (q,)).astype(np.int32)
    if sort_ids:
        ids_np = np.sort(ids_np)
    ids = jnp.asarray(ids_np)

    @jax.jit
    def loop(t, i0):
        def body(it, carry):
            acc, = carry
            idx = (i0 + it) % n  # rotate: no CSE across iterations
            if split == 1:
                acc = acc + jnp.sum(t[idx].astype(jnp.float32), axis=0)
            else:
                # `split` independent gathers over disjoint id slices of
                # the SAME table — tests whether XLA/the engine overlaps
                # independent gather streams
                per = q // split
                for s in range(split):
                    acc = acc + jnp.sum(
                        t[idx[s * per:(s + 1) * per]].astype(jnp.float32),
                        axis=0)
            return (acc,)
        acc0 = jnp.zeros((t.shape[1],), jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, (acc0,))[0]

    tab = jax.block_until_ready(fill(n, w))
    np.asarray(loop(tab, ids)[:1])  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(tab, ids)
        np.asarray(out[:1])
        ts.append(time.perf_counter() - t0)
    per = float(np.min(ts)) / ITERS
    row_b = 4 * w
    print(f"{name:34s} {per*1e3:8.3f} ms  {q*row_b/per/1e9:6.1f} GB/s  "
          f"{per/q*1e9:7.1f} ns/row  (N={n})", flush=True)
    del tab


# fixed 64 MB per gather (production volume), shape varies
run("prod  [8192 q, 2048 w] 8KB", 8192, 2048)
run("wide  [4096 q, 4096 w] 16KB", 4096, 4096)
run("wider [2048 q, 8192 w] 32KB", 2048, 8192)
run("narrow[16384 q, 1024 w] 4KB", 16384, 1024)
run("sorted[8192 q, 2048 w] 8KB", 8192, 2048, sort_ids=True)
run("split2[8192 q, 2048 w] 8KB", 8192, 2048, split=2)
run("split4[8192 q, 2048 w] 8KB", 8192, 2048, split=4)
run("deep  [16384 q, 2048 w] 8KB", 16384, 2048)
