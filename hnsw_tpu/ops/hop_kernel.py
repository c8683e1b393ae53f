"""Pallas fused gather+distance kernel — the flag-gated alternative to the
XLA hop distance op (SURVEY.md §2c "fused hop kernel").

STATUS (measured, TPU v5e, 2026-08; see ARCHITECTURE.md "gather roofline"):
the XLA path WINS and is the default. The hop op is bound by HBM row-fetch
TRANSACTIONS, not bytes: XLA's gather engine sustains ~90-95M 512B-row
fetches/s (~48 GB/s at d=128 f32, vs ~700 GB/s streaming), and the rate is
nearly independent of row width or dtype. This kernel — the batched-
descriptor redesign of round-1's per-query sequential version: a block of
queries per program, all BLOCK_Q*K row DMAs issued back-to-back, compute
overlapped via double buffering — reaches ~36M rows/s: each
`make_async_copy` descriptor costs ~28ns of scalar-core issue + DMA setup,
so per-row DMA cannot beat the dedicated gather hardware. Fusing the
distance reduction into the kernel saves only the [Q, K, d] intermediate's
HBM round-trip (~10% of hop cost), nowhere near the 2.5x descriptor-rate
deficit.

Kept wired behind ``HnswConfig``-independent opt-in (``use_pallas_hop=True``
on ``fused_gather_distances`` callers, or env ``HNSW_TPU_PALLAS_HOP=1`` for
``hnsw_tpu.search``) with a parity test (tests/test_hop_kernel.py) so the
comparison stays honest as compilers/hardware move.

Distance convention matches hnsw_tpu.search: L2 surrogate ||x||^2 - 2 q.x,
or -q.x for inner product. Requires d % 128 == 0 (DMA lane alignment) —
callers fall back to XLA otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import IP, L2

LANES = 128
BLOCK_Q = 8   # queries per program instance
NBUF = 2      # double buffer: block q+1's DMAs fly while q computes


def _kernel(ids_smem, q_ref, vec_hbm, dist_ref, vec_scr, sems, *, K, D,
            metric):
    """One program = BLOCK_Q queries.

    ids_smem: SMEM [BLOCK_Q * K] (scalar-prefetched slice, see index_map)
    q_ref:    VMEM [BLOCK_Q, D] queries
    vec_hbm:  ANY  [capacity, D] vector table
    dist_ref: VMEM [BLOCK_Q, K] output distances
    vec_scr:  VMEM [NBUF, K, D] gathered rows, double buffered
    sems:     DMA  [NBUF, K]
    """
    blk = pl.program_id(0)
    base = blk * BLOCK_Q * K

    def start_row_dmas(qi, slot):
        for k in range(K):
            pltpu.make_async_copy(
                vec_hbm.at[ids_smem[base + qi * K + k]],
                vec_scr.at[slot, k], sems.at[slot, k]).start()

    def wait_row_dmas(qi, slot):
        for k in range(K):
            pltpu.make_async_copy(
                vec_hbm.at[ids_smem[base + qi * K + k]],
                vec_scr.at[slot, k], sems.at[slot, k]).wait()

    start_row_dmas(0, 0)
    for qi in range(BLOCK_Q):
        if qi + 1 < BLOCK_Q:
            start_row_dmas(qi + 1, (qi + 1) % NBUF)
        wait_row_dmas(qi, qi % NBUF)
        rows = vec_scr[qi % NBUF]                     # [K, D]
        q = q_ref[qi, :]                              # [D]
        dots = jnp.sum(rows * q[None, :], axis=1)     # VPU reduce, [K]
        if metric == IP:
            dist_ref[qi, :] = -dots
        else:
            sq = jnp.sum(rows * rows, axis=1)
            dist_ref[qi, :] = sq - 2.0 * dots


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def fused_gather_distances(vectors: jax.Array, ids: jax.Array,
                           queries: jax.Array, metric: str = L2,
                           interpret: bool = False) -> jax.Array:
    """[capacity, d] x [Q, K] ids x [Q, d] queries -> [Q, K] distances.

    Out-of-range / negative ids are clamped to row 0 (callers mask the
    result, same contract as the XLA path). Q must be a multiple of
    BLOCK_Q and d a multiple of 128; callers pad or fall back.
    """
    Q, K = ids.shape
    D = vectors.shape[1]
    if Q % BLOCK_Q or D % LANES:
        raise ValueError(f"need Q % {BLOCK_Q} == 0 and d % {LANES} == 0, "
                         f"got Q={Q}, d={D}")
    ids_flat = jnp.clip(ids, 0, vectors.shape[0] - 1).reshape(-1)
    qf = queries.astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // BLOCK_Q,),
        in_specs=[
            pl.BlockSpec((BLOCK_Q, D), lambda i, ids: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BLOCK_Q, K), lambda i, ids: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, K, D), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, K)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, K=K, D=D, metric=metric),
        out_shape=jax.ShapeDtypeStruct((Q, K), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids_flat, qf, vectors.astype(jnp.float32))
