"""Probe: Pallas DMA packed-hop kernel vs the production XLA gather +
packed_row_dist pipeline (round-4 project, ARCHITECTURE.md "Remaining
headroom" option (b)).

Production hop (packed 8-bit, 1M x 128, ef=64): XLA gathers [Q] 8 KB u8
rows (0.89 ms at ~75 GB/s — 70% of the hop) into an HBM intermediate that
packed_row_dist then re-reads (0.147 ms). This kernel fuses the fetch into
the distance kernel with one per-query row DMA (HBM -> VMEM, double
buffered): total HBM traffic drops from ~201 MB (table read + intermediate
write + re-read) to ~69 MB, and the ~28 ns/descriptor scalar-core issue
overlaps the DMAs and the VPU compute. At k=1 expansion each query needs
exactly ONE row per hop, so the 512 B-row descriptor-rate wall that sank
ops/hop_kernel.py (K=64 rows/query) does not apply: 8192 descriptors/hop
x 28 ns = 0.23 ms issue, hidden under the compute.

Usage: python scripts/packed_hop_kernel_probe.py [N] [Q] [ITERS]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 64
M0 = 64
D = 128
BQ = 256
NBUF = 4

rng = np.random.default_rng(0)
print(f"device={jax.devices()[0]} N={N} Q={Q} m0={M0} d={D} iters={ITERS} "
      f"row_bytes={M0*D} bytes/hop={Q*M0*D/1e6:.1f} MB", flush=True)


# ---- build tables on device
@jax.jit
def fill_tables(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    codes = jax.random.randint(k1, (N, M0, D), 0, 256, jnp.int32)
    codes = codes.astype(jnp.uint8)
    sq = jax.random.uniform(k2, (N, M0), jnp.float32, 0.0, 100.0)
    qs = jax.random.normal(k3, (Q, D), jnp.float32)
    ids = jax.random.randint(k4, (Q,), 0, N, jnp.int32)
    return codes, sq, qs, ids


codes3, sqtab, qs, ids = jax.block_until_ready(
    fill_tables(jax.random.PRNGKey(0)))
codes2 = codes3.reshape(N, M0 * D)  # the production 2-D u8 table view


# ---- path A: production (XLA gather + packed_row_dist kernel)
sys.path.insert(0, "/root/repo")
from hnsw_tpu.ops.dist_kernel import packed_row_dist  # noqa: E402


@jax.jit
def prod_hop(tab2, sqt, qs, idx):
    rows = tab2.at[idx].get(mode="clip")           # [Q, m0*d] u8
    sq = sqt.at[idx].get(mode="clip")              # [Q, m0]
    return packed_row_dist(rows, qs, sq, k=M0, bits=8, metric="l2")


# ---- path B: fused DMA hop kernel
def _dma_kernel(ids_smem, qs_ref, sq_ref, tab_hbm, out_ref, scr, sems):
    blk = pl.program_id(0)
    base = blk * BQ

    def issue(qi, slot):
        pltpu.make_async_copy(tab_hbm.at[ids_smem[base + qi]],
                              scr.at[slot], sems.at[slot]).start()

    # prologue: fill the pipeline
    for s in range(NBUF - 1):
        issue(s, s)

    def body(qi, carry):
        slot = jax.lax.rem(qi, NBUF)

        @pl.when(qi + NBUF - 1 < BQ)
        def _issue_ahead():
            issue(qi + NBUF - 1, jax.lax.rem(qi + NBUF - 1, NBUF))

        pltpu.make_async_copy(tab_hbm.at[ids_smem[base + qi]],
                              scr.at[slot], sems.at[slot]).wait()
        rows = scr[slot].astype(jnp.int32).astype(jnp.float32)  # [m0, d]
        q = qs_ref[qi, :]                                       # [d]
        dots = jnp.sum(rows * q[None, :], axis=1)               # [m0]
        out_ref[qi, :] = sq_ref[qi, :] - 2.0 * dots
        return carry

    jax.lax.fori_loop(0, BQ, body, 0)


@jax.jit
def dma_hop(tab3, sqt, qs, idx):
    sq = sqt.at[idx].get(mode="clip")              # [Q, m0] via XLA gather
    idx = jnp.clip(idx, 0, N - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // BQ,),
        in_specs=[
            pl.BlockSpec((BQ, D), lambda i, ids: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, M0), lambda i, ids: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BQ, M0), lambda i, ids: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, M0, D), jnp.uint8),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    return pl.pallas_call(
        _dma_kernel,
        out_shape=jax.ShapeDtypeStruct((Q, M0), jnp.float32),
        grid_spec=grid_spec,
    )(idx, qs, sq, tab3)


# ---- correctness
da = np.asarray(prod_hop(codes2, sqtab, qs, ids))
db = np.asarray(dma_hop(codes3, sqtab, qs, ids))
err = np.max(np.abs(da - db))
print(f"max |prod - dma| = {err:.3e}", flush=True)
assert err < 1e-2, "MISMATCH"


# ---- timing: ITERS hops inside one jitted loop, ids rotated
def bench(name, fn, *tabs):
    @jax.jit
    def loop(idx0, *t):
        def body(it, carry):
            acc, = carry
            idx = (idx0 + it) % N
            d = fn(*t, qs, idx)
            return (acc + d[0, :1],)
        return jax.lax.fori_loop(0, ITERS, body,
                                 (jnp.zeros((1,), jnp.float32),))[0]

    out = loop(ids, *tabs)
    np.asarray(out)  # warm + sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(ids, *tabs)
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    per = float(np.min(ts)) / ITERS
    gbps = Q * M0 * D / per / 1e9
    print(f"{name:24s} {per*1e3:8.3f} ms/hop  (table bytes {gbps:6.1f} GB/s)",
          flush=True)


bench("prod gather+distkern", lambda t, s, q, i: prod_hop(t, s, q, i),
      codes2, sqtab)
bench("fused DMA hop kernel", lambda t, s, q, i: dma_hop(t, s, q, i),
      codes3, sqtab)
