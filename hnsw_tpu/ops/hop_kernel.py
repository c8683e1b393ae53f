"""Pallas fused hop kernel (SURVEY.md §2b C5, §2c): neighbor-row fetch +
vector gather + batched distance in ONE kernel.

Why: the level-0 beam hop is the dominant query cost. In pure XLA it is
  cur -> gather neighbor ids      (materializes [Q, K] from HBM)
  ids -> gather vectors           (materializes [Q, K, d] = 100s of MB)
  einsum                          (re-reads those 100s of MB)
The gathered vectors make a full HBM round-trip. This kernel instead streams
each query's K neighbor rows HBM->VMEM with double-buffered async DMAs and
reduces them to distances in VMEM, writing only [Q, K] ids + distances back
(~100x less traffic than the XLA path's intermediates).

Distance convention matches hnsw_tpu.search: L2 surrogate ||x||^2 - 2 q·x
(the ||x||^2 term is computed in-kernel from the gathered row, saving a
second scattered gather of sqnorms), or -q·x for inner product.

TPU constraints shape the layout: HBM->VMEM DMA slices must be 128-lane
aligned, so the adjacency table is viewed as [N*K/128, 128] ("folded": each
128-lane row holds `fold = 128//K` nodes' lists) and the wanted K-slice is
selected statically after the copy. Vector rows must have d % 128 == 0 — the
caller pads storage (see HnswIndex._maybe_pad).

Grid: one program per QB-query block. Per query: 1 DMA for its adjacency row,
K row DMAs for neighbor vectors, VPU multiply-reduce; DMAs for query i+1 are
issued while query i computes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import L2

LANES = 128


def _hop_kernel(cur_ref, q_ref, adj_hbm, vec_hbm, nbrs_out, dist_out,
                adj_scr, vec_scr, adj_sem, vec_sem, *, K, D, QB, fold,
                metric):
    """adj_hbm folded [N*K/128, 128]; adj_scr [2, 1, 128]; vec_scr [2, K, D]."""

    def adj_copy(slot, qi):
        node = cur_ref[qi, 0]
        return pltpu.make_async_copy(
            adj_hbm.at[pl.ds(node // fold, 1), :],
            adj_scr.at[slot], adj_sem.at[slot])

    def adj_row(slot, qi):
        """K neighbor ids of query qi from the folded 128-lane row."""
        node = cur_ref[qi, 0]
        full = adj_scr[slot, 0, :]                       # [128]
        if fold == 1:
            return full
        # static halves/quarters; select by node % fold
        parts = [full[i * K:(i + 1) * K] for i in range(fold)]
        sel = parts[0]
        for i in range(1, fold):
            sel = jnp.where(node % fold == i, parts[i], sel)
        return sel

    def start_rows(slot, qi):
        ids = adj_row(slot, qi)
        for j in range(K):
            nid = jnp.maximum(ids[j], 0)
            pltpu.make_async_copy(
                vec_hbm.at[pl.ds(nid, 1), :],
                vec_scr.at[slot, pl.ds(j, 1), :],
                vec_sem.at[slot, j]).start()

    def wait_rows(slot, qi):
        # descriptors must match start_rows; adj_scr[slot] is still intact
        ids = adj_row(slot, qi)
        for j in range(K):
            nid = jnp.maximum(ids[j], 0)
            pltpu.make_async_copy(
                vec_hbm.at[pl.ds(nid, 1), :],
                vec_scr.at[slot, pl.ds(j, 1), :],
                vec_sem.at[slot, j]).wait()

    # prologue: adjacency row 0 -> its vector rows; adjacency row 1 in flight
    adj_copy(0, 0).start()
    adj_copy(0, 0).wait()
    start_rows(0, 0)

    @pl.when(QB > 1)
    def _():
        adj_copy(1, 1).start()

    def body(qi, _):
        slot = jax.lax.rem(qi, 2)
        nxt = jax.lax.rem(qi + 1, 2)

        # adjacency for qi+1 is in flight; finish it and launch its vector
        # rows so they overlap with qi's compute
        @pl.when(qi + 1 < QB)
        def _():
            adj_copy(nxt, qi + 1).wait()
            start_rows(nxt, qi + 1)

        wait_rows(slot, qi)
        ids = adj_row(slot, qi)                    # [K]
        rows = vec_scr[slot]                       # [K, D] f32
        q = q_ref[qi, :]                           # [D]
        dots = jnp.sum(rows * q[None, :], axis=1)  # [K] VPU reduce
        if metric == L2:
            sq = jnp.sum(rows * rows, axis=1)
            dist = sq - 2.0 * dots
        else:
            dist = -dots
        nbrs_out[qi, :] = ids
        dist_out[qi, :] = dist

        # adj_scr[slot] is free only now (ids consumed); prefetch qi+2
        @pl.when(qi + 2 < QB)
        def _():
            adj_copy(slot, qi + 2).start()

        return 0

    jax.lax.fori_loop(0, QB, body, 0)


@functools.partial(jax.jit, static_argnames=("metric", "qb"))
def fused_hop_distances(cur: jax.Array, queries: jax.Array,
                        adjacency: jax.Array, vectors: jax.Array,
                        *, metric: str = L2, qb: int = 64):
    """cur [Q] int32 (node per query; must be >= 0, use 0 for masked),
    queries [Q, D] f32, adjacency [N, K] int32 (K power of two <= 128),
    vectors [N, D] f32 with D % 128 == 0 and ||N*K % 128 == 0.
    Returns (nbrs [Q, K] int32, dists [Q, K] f32 surrogate, unmasked)."""
    Q, D = queries.shape
    N, K = adjacency.shape
    assert D % LANES == 0, f"vector dim {D} must be padded to 128"
    assert LANES % K == 0 or K % LANES == 0, K
    fold = max(1, LANES // K)
    assert (N * K) % LANES == 0
    assert Q % qb == 0, (Q, qb)
    adj_folded = adjacency.reshape(-1, LANES) if fold > 1 else adjacency
    grid = (Q // qb,)

    kernel = functools.partial(_hop_kernel, K=K, D=D, QB=qb, fold=fold,
                               metric=metric)
    nbrs, dists = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),        # cur ids
            pl.BlockSpec((qb, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),        # queries
            pl.BlockSpec(memory_space=pltpu.ANY),         # adjacency (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),         # vectors (HBM)
        ],
        out_specs=[
            pl.BlockSpec((qb, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, K), jnp.int32),
            jax.ShapeDtypeStruct((Q, K), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 1, LANES), jnp.int32),
            pltpu.VMEM((2, K, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, K)),
        ],
    )(cur[:, None], queries, adj_folded, vectors)
    return nbrs, dists
