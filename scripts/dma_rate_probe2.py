"""Probe 2: G-row-batched DMA pipeline — amortize the ~150 ns/row scalar
overhead found by dma_rate_probe.py (row rate saturated at ~7 M rows/s
independent of row size, i.e. scalar-bound, while 32 KB rows streamed at
197 GB/s). Issue G row-DMAs per loop iteration (statically unrolled),
compute G queries vectorized.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 200_000
Q = 8192
ITERS = 32
SUB, LANES = 64, 128   # 8 KB row

rng = np.random.default_rng(0)
print(f"device={jax.devices()[0]} N={N} Q={Q} row={SUB*LANES}B "
      f"iters={ITERS}", flush=True)


@functools.partial(jax.jit, static_argnames=("rows", "cols"))
def fill(rows, cols):
    r = jnp.arange(rows, dtype=jnp.int32)[:, None]
    c = jnp.arange(cols, dtype=jnp.int32)[None, :]
    return ((r * 131 + c * 17) & 0xFF).astype(jnp.uint8)


ids = jnp.asarray(rng.integers(0, N, (Q,)).astype(np.int32))


def make_hop(g, nbuf, bq, compute):
    n_grp = bq // g

    def _kern(ids_smem, qs_ref, tab_hbm, out_ref, scr, sems):
        blk = pl.program_id(0)
        base = blk * bq

        def issue(grp, slot):
            for j in range(g):
                pltpu.make_async_copy(
                    tab_hbm.at[ids_smem[base + grp * g + j]],
                    scr.at[slot, j], sems.at[slot, j]).start()

        def wait(grp, slot):
            for j in range(g):
                pltpu.make_async_copy(
                    tab_hbm.at[ids_smem[base + grp * g + j]],
                    scr.at[slot, j], sems.at[slot, j]).wait()

        for s in range(nbuf - 1):
            issue(s, s)

        def body(grp, carry):
            slot = jax.lax.rem(grp, nbuf)

            @pl.when(grp + nbuf - 1 < n_grp)
            def _issue_ahead():
                issue(grp + nbuf - 1, jax.lax.rem(grp + nbuf - 1, nbuf))

            wait(grp, slot)
            if compute:
                rows = scr[slot].astype(jnp.int32).astype(
                    jnp.float32)                       # [g, sub, lanes]
                q = qs_ref[pl.ds(grp * g, g), :]       # [g, lanes]
                dots = jnp.sum(rows * q[:, None, :], axis=2)  # [g, sub]
                out_ref[pl.ds(grp * g, g), :] = dots
            else:
                out_ref[pl.ds(grp * g, g), :] = jnp.full(
                    (g, SUB), grp, jnp.float32)
            return carry

        jax.lax.fori_loop(0, n_grp, body, 0)

    @jax.jit
    def hop(tab3, qs, idx):
        idx = jnp.clip(idx, 0, N - 1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Q // bq,),
            in_specs=[pl.BlockSpec((bq, LANES), lambda i, ids: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((bq, SUB), lambda i, ids: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nbuf, g, SUB, LANES), jnp.uint8),
                pltpu.SemaphoreType.DMA((nbuf, g)),
            ],
        )
        return pl.pallas_call(
            _kern,
            out_shape=jax.ShapeDtypeStruct((Q, SUB), jnp.float32),
            grid_spec=grid_spec,
        )(idx, qs, tab3)

    return hop


tab = jax.block_until_ready(fill(N, SUB * LANES)).reshape(N, SUB, LANES)
qs = jax.block_until_ready(
    jax.random.normal(jax.random.PRNGKey(1), (Q, LANES), jnp.float32))


def bench(name, fn):
    @jax.jit
    def loop(idx0, t, q):
        def body(it, carry):
            acc, = carry
            d = fn(t, q, (idx0 + it) % N)
            return (acc + d[0, :1],)
        return jax.lax.fori_loop(0, ITERS, body,
                                 (jnp.zeros((1,), jnp.float32),))[0]

    np.asarray(loop(ids, tab, qs))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(ids, tab, qs)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    per = float(np.min(ts)) / ITERS
    row_b = SUB * LANES
    print(f"{name:40s} {per*1e3:8.3f} ms  ({Q*row_b/per/1e9:6.1f} GB/s, "
          f"{Q/per/1e6:5.2f} M rows/s)", flush=True)


for g, nbuf, bq, comp in [
        (8, 2, 256, False),
        (8, 4, 256, False),
        (16, 4, 256, False),
        (32, 4, 256, False),
        (16, 4, 256, True),
        (32, 4, 256, True),
        (32, 8, 512, True),
]:
    bench(f"g={g} nbuf={nbuf} bq={bq} compute={comp}",
          make_hop(g, nbuf, bq, comp))
