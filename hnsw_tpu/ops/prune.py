"""Vectorized select-neighbors heuristic (SURVEY.md §2b C9).

The quality-critical HNSW pruning rule (paper Alg. 4 / faiss
``shrink_neighbor_list``): scanning candidates by increasing distance to the
query, keep candidate c only if c is closer to the query than to every
already-kept neighbor. The rule is sequential in the scan position but fully
data-parallel across the batch, so the TPU realization is: one batched
pairwise-distance matmul (MXU) + a fori_loop over the candidate axis doing
[B]-wide mask updates (VPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import IP, L2


def pairwise_candidate_distances(vecs: jax.Array, metric: str) -> jax.Array:
    """[B, C, d] -> [B, C, C] true metric distances between candidates."""
    v = vecs.astype(jnp.float32)
    dots = jnp.einsum("bid,bjd->bij", v, v, preferred_element_type=jnp.float32)
    if metric == IP:
        return -dots
    sq = jnp.einsum("bid,bid->bi", v, v, preferred_element_type=jnp.float32)
    return sq[:, :, None] + sq[:, None, :] - 2.0 * dots


@functools.partial(jax.jit, static_argnames=("m", "metric"))
def select_neighbors(
    cand_ids: jax.Array,    # int32 [B, C], -1 == invalid slot
    cand_dists: jax.Array,  # f32   [B, C], TRUE metric distance to the query
    cand_vecs: jax.Array,   # f32   [B, C, d] candidate vectors
    *,
    m: int,
    metric: str = L2,
) -> tuple[jax.Array, jax.Array]:
    """Prune candidate sets to <= m diversified neighbors.

    Returns (kept_ids [B, m] int32 -1-padded in scan order, kept_mask [B, C]).
    Candidates need not be pre-sorted; duplicates (same id twice in a row)
    must not occur (graph invariant).
    """
    B, C = cand_ids.shape
    big = jnp.inf
    d_sorted_key = jnp.where(cand_ids >= 0, cand_dists, big)
    order = jnp.argsort(d_sorted_key, axis=1)
    ids = jnp.take_along_axis(cand_ids, order, axis=1)
    dist_q = jnp.take_along_axis(d_sorted_key, order, axis=1)
    vecs = jnp.take_along_axis(cand_vecs, order[:, :, None], axis=1)

    pair = pairwise_candidate_distances(vecs, metric)  # [B, C, C]

    kept = jnp.zeros((B, C), jnp.bool_)
    count = jnp.zeros((B,), jnp.int32)

    def body(j, state):
        kept, count = state
        dj = dist_q[:, j]                                   # [B]
        valid = (ids[:, j] >= 0) & (dj < big)
        # conflict: some already-kept i has dist(c_j, c_i) < dist(c_j, q)
        conflict = jnp.any(kept & (pair[:, j, :] < dj[:, None]), axis=1)
        take = valid & ~conflict & (count < m)
        kept = kept.at[:, j].set(take)
        return kept, count + take.astype(jnp.int32)

    kept, count = jax.lax.fori_loop(0, C, body, (kept, count))

    # compact kept ids (scan order) into m slots
    rank = jnp.cumsum(kept.astype(jnp.int32), axis=1) - 1   # [B, C]
    out = jnp.full((B, m), -1, jnp.int32)
    bidx = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0)
    rank_c = jnp.where(kept, rank, m)  # dropped -> out-of-range slot
    out = out.at[bidx, rank_c].set(jnp.where(kept, ids, -1), mode="drop")

    # un-sort kept_mask back to the caller's candidate order
    inv_mask = jnp.zeros((B, C), jnp.bool_)
    inv_mask = inv_mask.at[bidx, order].set(kept)
    return out, inv_mask
