"""Pallas routing-distance kernels — the hop's contraction at memory speed.

The level-0 hop computes, per query, distances from its query vector to the
K candidates it just fetched: a BATCHED matvec ``dist[q,k] = f(Σ_d
q[q,d]·v[q,k,d])``. XLA has no good lowering for this block-diagonal
contraction on TPU — einsum, dot_general and multiply+reduce all cost
~2.1-2.6 ms per hop at Q=8192, K=64, d=128 on v5e (measured in-loop,
scripts/hop_cost_bench.py methodology), independent of operand layout
(k-major vs d-major rows) and dtype. That single op dominated the packed
serving hop. The same contraction VMEM-tiled in Pallas — cast, broadcast
multiply, lane-reduce per [bq·K, d] block — runs at ~0.12 ms/hop (13.6x),
bit-exact to the f32 einsum, because the operands stream HBM→VMEM once and
the reduce never leaves registers.

Two kernels:

  * ``packed_row_dist`` — packed serving mode (ops/packed.py): candidates'
    quantized codes arrive CONCATENATED in one row per expanded node
    ([Q, K·d] uint8, k-major). Handles 8-bit (one byte/dim) and 4-bit
    (two dims/byte) codes; the 4-bit path never interleaves nibbles —
    ``Σ_d q[d]·u[d] = Σ_b q[2b]·lo[b] + q[2b+1]·hi[b]``, so the low/high
    nibble planes are reduced against the even/odd dims of q directly.
  * ``gathered_vec_dist`` — exact-storage routing and the extraction
    rerank: candidates as gathered vector rows [Q, K, d] (f32 storage, or
    sq8 codes with the affine dequant fused in-kernel). Computes the full
    L2 surrogate ``Σv² − 2Σqv`` (or −Σqv for IP) in one pass; the f32
    arithmetic is exactly the einsum-with-HIGHEST it replaces.

The row gather that FEEDS these kernels stays in XLA: the gather engine
moves scattered rows at near-HBM speed (ARCHITECTURE.md "gather roofline")
and Pallas cannot beat it — only the contraction was broken.

No faiss analogue (CPU SIMD distances are `fvec_L2sqr` loops;
`/root/reference/README.md:2` names faiss-HNSW as the capability spec —
this is the TPU-native realization of SURVEY.md §2b C3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..config import IP


def _f32(u: jax.Array) -> jax.Array:
    # Mosaic has no uint8 -> float32 cast; hop through int32
    if u.dtype == jnp.uint8:
        return u.astype(jnp.int32).astype(jnp.float32)
    return u.astype(jnp.float32)


def _packed_dist_kernel(rows_ref, qe_ref, qo_ref, sq_ref, out_ref, *,
                        k: int, bits: int, metric: str):
    """qe/qo: for bits=8, qe is the full query block [bq, d] (qo unused —
    the wrapper passes qe twice for fixed arity); for bits=4 they are the
    EVEN/ODD query dims [bq, db], split in the wrapper — Mosaic has no
    lowering for a strided lane slice (``q[:, 0::2]``) inside the kernel."""
    bq = rows_ref.shape[0]
    db = qe_ref.shape[1]
    if bits == 8:
        u = _f32(rows_ref[:].reshape(bq * k, db))          # [bq*k, d]
        qrep = jnp.broadcast_to(
            qe_ref[:][:, None, :], (bq, k, db)).reshape(bq * k, db)
        dots = jnp.sum(u * qrep, axis=1).reshape(bq, k)
    else:
        # nibble planes against even/odd query dims — no interleave:
        #   Σ_d q[d]·u[d] = Σ_b q[2b]·lo[b] + q[2b+1]·hi[b]
        # split in f32 (exact below 2^24): Mosaic has no u8-vector
        # shift/and lowering ('failed to legalize arith.shrui')
        raw = _f32(rows_ref[:].reshape(bq * k, db))        # [bq*k, d/2]
        hi = jnp.floor(raw * 0.0625)
        lo = raw - 16.0 * hi
        qer = jnp.broadcast_to(
            qe_ref[:][:, None, :], (bq, k, db)).reshape(bq * k, db)
        qor = jnp.broadcast_to(
            qo_ref[:][:, None, :], (bq, k, db)).reshape(bq * k, db)
        dots = jnp.sum(lo * qer + hi * qor, axis=1).reshape(bq, k)
    if metric == IP:
        out_ref[:] = -dots
    else:
        out_ref[:] = sq_ref[:] - 2.0 * dots


@functools.partial(jax.jit, static_argnames=("k", "bits", "metric", "bq",
                                             "interpret"))
def packed_row_dist(rows: jax.Array, qs: jax.Array, nbr_sq: jax.Array, *,
                    k: int, bits: int, metric: str, bq: int = 256,
                    interpret: bool = False) -> jax.Array:
    """Routing distances from packed code rows.

    rows uint8 [Q, k*d*bits/8] (k-major: candidate j's codes at
    [j*d*bits/8 : (j+1)*d*bits/8]); qs f32 [Q, d] pre-scaled query
    (q·scale); nbr_sq f32 [Q, k] ||x̂||² of each candidate (ignored for IP).
    Q must be a multiple of bq (callers pad — the fused beam path already
    runs on 512-padded batches). Returns f32 [Q, k] surrogate distances.
    """
    q, row_w = rows.shape
    d = qs.shape[1]
    db = d if bits == 8 else (d + 1) // 2
    assert row_w == k * db, (row_w, k, d, bits)
    # even/odd query-dim split for the 4-bit nibble planes happens HERE
    # (XLA-land): Mosaic cannot lower a strided lane slice inside the kernel
    if bits == 8:
        qe, qo = qs, qs  # qo unused in-kernel; fixed arity
    else:
        qe, qo = qs[:, 0::2], qs[:, 1::2]
        if qo.shape[1] < db:  # odd d: pad the missing odd dim with 0
            qo = jnp.pad(qo, ((0, 0), (0, db - qo.shape[1])))
    # Mosaic's in-kernel [bq, k*db] -> [bq*k, db] shape cast needs the lane
    # dim (db) to be a multiple of 128 (fails at d=64/96/100 8-bit and at
    # every d < 256 4-bit: "unsupported shape cast"). Zero-pad each
    # candidate's code segment up to the next multiple — padded code bytes
    # are 0 and the matching query dims are zero-padded too, so every dot
    # is unchanged. The pad is one streaming copy of the rows (~0.1 ms at
    # serving shape), far below the 13.6x the kernel saves.
    dp = -(-db // 128) * 128
    if dp != db:
        rows = jnp.pad(rows.reshape(q, k, db),
                       ((0, 0), (0, 0), (0, dp - db))).reshape(q, k * dp)
        row_w = k * dp
        qe = jnp.pad(qe, ((0, 0), (0, dp - qe.shape[1])))
        qo = jnp.pad(qo, ((0, 0), (0, dp - qo.shape[1])))
    bq = min(bq, q)
    assert q % bq == 0, (q, bq)
    return pl.pallas_call(
        functools.partial(_packed_dist_kernel, k=k, bits=bits,
                          metric=metric),
        grid=(q // bq,),
        in_specs=[pl.BlockSpec((bq, row_w), lambda i: (i, 0)),
                  pl.BlockSpec((bq, qe.shape[1]), lambda i: (i, 0)),
                  pl.BlockSpec((bq, qo.shape[1]), lambda i: (i, 0)),
                  pl.BlockSpec((bq, k), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bq, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((q, k), jnp.float32),
        interpret=interpret,
    )(rows, qe, qo, nbr_sq)


def _vec_dist_kernel(vecs_ref, qs_ref, off_ref, sc_ref, out_ref, *, k: int,
                     d: int, metric: str, dequant: bool):
    bq = vecs_ref.shape[0]
    v = _f32(vecs_ref[:].reshape(bq * k, d))
    if dequant:
        v = off_ref[:] + sc_ref[:] * v                     # [1, d] broadcast
    qrep = jnp.broadcast_to(
        qs_ref[:][:, None, :], (bq, k, d)).reshape(bq * k, d)
    dots = jnp.sum(v * qrep, axis=1).reshape(bq, k)
    if metric == IP:
        out_ref[:] = -dots
    else:
        sq = jnp.sum(v * v, axis=1).reshape(bq, k)
        out_ref[:] = sq - 2.0 * dots


@functools.partial(jax.jit, static_argnames=("metric", "bq", "interpret"))
def gathered_vec_dist(vecs: jax.Array, qs: jax.Array, dequant=None, *,
                      metric: str, bq: int = 0,
                      interpret: bool = False) -> jax.Array:
    """Surrogate distances to gathered candidate vectors.

    vecs [Q, k, d] (f32/bf16 values, or uint8 sq codes with ``dequant`` =
    (offset [d], scale [d])); qs f32 [Q, d]. Returns f32 [Q, k]:
    ``Σv²−2Σqv`` (L2 surrogate) or ``−Σqv`` (IP), f32-exact — the in-loop
    replacement for the einsum-with-HIGHEST pair in search._make_distance_fn.
    Q must be a multiple of bq.
    """
    q, k, d = vecs.shape
    # same lane-alignment pad as packed_row_dist: the in-kernel
    # [bq, k, d] -> [bq*k, d] cast needs d % 128 == 0. Padded dims are 0
    # in vecs, qs AND the dequant affine (offset 0, scale 0 -> v stays 0),
    # so Σv² and Σqv are unchanged.
    dp = -(-d // 128) * 128
    if dp != d:
        vecs = jnp.pad(vecs, ((0, 0), (0, 0), (0, dp - d)))
        qs = jnp.pad(qs, ((0, 0), (0, dp - d)))
        if dequant is not None:
            dequant = (jnp.pad(jnp.asarray(dequant[0], jnp.float32).ravel(),
                               (0, dp - d)),
                       jnp.pad(jnp.asarray(dequant[1], jnp.float32).ravel(),
                               (0, dp - d)))
        d = dp
    if bq <= 0:
        # VMEM: the block itself (bq*k*d*itemsize, double-buffered) plus
        # the kernel's f32 working set (~2 block-sized f32 arrays) must
        # stay well under the 16 MB scoped limit — budget ~1 MB of f32
        # working elements per block
        bq = max(8, min(512, (1 << 18) // max(k * d, 1)))
        bq = 1 << (bq.bit_length() - 1)
    bq = min(bq, q)
    assert q % bq == 0, (q, bq)
    has_dq = dequant is not None
    if has_dq:
        off = jnp.asarray(dequant[0], jnp.float32).reshape(1, d)
        sc = jnp.asarray(dequant[1], jnp.float32).reshape(1, d)
    else:  # fixed arity: pass identity affine, branch is static
        off = jnp.zeros((1, d), jnp.float32)
        sc = jnp.ones((1, d), jnp.float32)
    return pl.pallas_call(
        functools.partial(_vec_dist_kernel, k=k, d=d, metric=metric,
                          dequant=has_dq),
        grid=(q // bq,),
        in_specs=[pl.BlockSpec((bq, k, d), lambda i: (i, 0, 0)),
                  pl.BlockSpec((bq, d), lambda i: (i, 0)),
                  pl.BlockSpec((1, d), lambda i: (0, 0)),
                  pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bq, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((q, k), jnp.float32),
        interpret=interpret,
    )(vecs, qs, off, sc)
