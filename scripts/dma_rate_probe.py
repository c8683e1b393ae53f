"""Probe: raw per-row DMA throughput (HBM->VMEM) vs row size, pipeline
depth, and compute — isolates what bounds the fused packed-hop kernel.

Variants: pure DMA (wait only, no compute), DMA+compute, and NBUF depth.
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

rng = np.random.default_rng(0)
print(f"device={jax.devices()[0]} N={N} Q={Q} iters={ITERS}", flush=True)


@functools.partial(jax.jit, static_argnames=("rows", "cols"))
def fill(rows, cols):
    r = jnp.arange(rows, dtype=jnp.int32)[:, None]
    c = jnp.arange(cols, dtype=jnp.int32)[None, :]
    return ((r * 131 + c * 17) & 0xFF).astype(jnp.uint8)


ids = jnp.asarray(rng.integers(0, N, (Q,)).astype(np.int32))


def make_hop(sub, lanes, nbuf, bq, compute):
    def _kern(ids_smem, tab_hbm, out_ref, scr, sems):
        blk = pl.program_id(0)
        base = blk * bq

        def issue(qi, slot):
            pltpu.make_async_copy(tab_hbm.at[ids_smem[base + qi]],
                                  scr.at[slot], sems.at[slot]).start()

        for s in range(nbuf - 1):
            issue(s, s)

        def body(qi, carry):
            slot = jax.lax.rem(qi, nbuf)

            @pl.when(qi + nbuf - 1 < bq)
            def _issue_ahead():
                issue(qi + nbuf - 1, jax.lax.rem(qi + nbuf - 1, nbuf))

            pltpu.make_async_copy(tab_hbm.at[ids_smem[base + qi]],
                                  scr.at[slot], sems.at[slot]).wait()
            if compute:
                rows = scr[slot].astype(jnp.int32).astype(jnp.float32)
                out_ref[qi, :] = jnp.sum(rows, axis=0)
            else:
                out_ref[qi, :] = jnp.full((128,), qi, jnp.float32)
            return carry

        jax.lax.fori_loop(0, bq, body, 0)

    @jax.jit
    def hop(tab3, idx):
        idx = jnp.clip(idx, 0, N - 1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Q // bq,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((bq, 128), lambda i, ids: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nbuf, sub, lanes), jnp.uint8),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )
        return pl.pallas_call(
            _kern,
            out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.float32),
            grid_spec=grid_spec,
        )(idx, tab3)

    return hop


def bench(name, fn, tab):
    @jax.jit
    def loop(idx0, t):
        def body(it, carry):
            acc, = carry
            d = fn(t, (idx0 + it) % N)
            return (acc + d[0, :1],)
        return jax.lax.fori_loop(0, ITERS, body,
                                 (jnp.zeros((1,), jnp.float32),))[0]

    np.asarray(loop(ids, tab))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(ids, tab)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    per = float(np.min(ts)) / ITERS
    row_b = tab.shape[1] * tab.shape[2]
    print(f"{name:44s} {per*1e3:8.3f} ms  ({Q*row_b/per/1e9:6.1f} GB/s, "
          f"{Q/per/1e6:5.2f} M rows/s)", flush=True)


for sub, lanes, nbuf, bq, comp in [
        (64, 128, 4, 256, False),   # 8 KB row, pure DMA
        (64, 128, 8, 256, False),
        (64, 128, 16, 256, False),
        (64, 128, 16, 256, True),   # + compute
        (16, 128, 16, 256, False),  # 2 KB row
        (256, 128, 8, 256, False),  # 32 KB row
]:
    tab = jax.block_until_ready(fill(N, sub * lanes)).reshape(N, sub, lanes)
    hop = make_hop(sub, lanes, nbuf, bq, comp)
    bench(f"row={sub*lanes}B nbuf={nbuf} compute={comp}", hop, tab)
    del tab
