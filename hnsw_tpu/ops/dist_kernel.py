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


def _words_dist_kernel(words_ref, qq_ref, s_ref, out_ref, *, k: int,
                       wp: int, bits: int, g: int):
    """Dot products from int32 word-packed code rows (ops/packed.py "words"
    layout). The words block [bq, k*wp] lane-splits to [bq*k/g, 128] (each
    128-lane row holds g = 128/wp whole candidate segments — word_width
    guarantees wp | 128 and the caller guarantees g | k, so segments never
    straddle rows). Each of the 32/bits byte/nibble planes is shifted+masked
    out and multiplied against the matching pre-tiled query plane; the final
    per-candidate reduction over the wp lanes of each segment is one
    [rr, 128] x [128, gp] MXU matmul with the 0/1 segment-selector S."""
    bq = words_ref.shape[0]
    vpw = 32 // bits
    rr = bq * k // g                    # rows after the 128-lane reshape
    rep = rr // bq                      # segment-rows per query
    w = words_ref[:].reshape(rr, 128)
    mask = (1 << bits) - 1
    acc = jnp.zeros((rr, 128), jnp.float32)
    for j in range(vpw):
        # arithmetic shift sign-extends the wrapped high byte; the mask
        # strips it (pack_words stores the exact low-32-bit pattern)
        p = ((w >> (bits * j)) & mask).astype(jnp.float32)
        # plane j lives at the j-th 128-lane slice of the flattened qq
        # block (a static 128-aligned lane slice — Mosaic-safe, unlike a
        # 3-D ref index)
        qj = qq_ref[:, j * 128:(j + 1) * 128]          # [bq, 128]
        qrep = jnp.broadcast_to(
            qj[:, None, :], (bq, rep, 128)).reshape(rr, 128)
        acc = acc + p * qrep
    out_ref[:] = jax.lax.dot(acc, s_ref[:],
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("bits", "wp"))
def words_query_planes(qs: jax.Array, *, bits: int, wp: int) -> jax.Array:
    """Pre-tiled query planes for ``packed_row_dist_words``: f32
    [Q, (32/bits)*128], plane j at lanes [j*128, (j+1)*128) with lane
    offset L = qs_pad[:, vpw*(L%wp) + j] — i.e. the query dim that
    multiplies byte/nibble j of word L%wp in a candidate segment
    (pack_words packs value v_j at bits [bits*j, bits*(j+1)) of word
    v // vpw, little-endian). Flattened 2-D so the kernel reads plane j as
    a static 128-aligned lane slice. Computed ONCE per search call
    (outside the hop loop) by make_packed_expand; per-hop cost is just the
    re-read."""
    q, d = qs.shape
    vpw = 32 // bits
    g = 128 // wp
    pad = wp * vpw - d
    qp = jnp.pad(qs, ((0, 0), (0, pad))) if pad else qs
    planes = jnp.stack([qp[:, j::vpw] for j in range(vpw)], axis=1)
    return jnp.tile(planes, (1, 1, g)).reshape(q, vpw * 128)


@functools.partial(jax.jit, static_argnames=("k", "wp", "bits", "bq",
                                             "interpret"))
def packed_row_dist_words(words: jax.Array, qq: jax.Array, *, k: int,
                          wp: int, bits: int, bq: int = 256,
                          interpret: bool = False) -> jax.Array:
    """Routing dot products Σ_d q[d]·code[d] from word-packed rows.

    words int32 [Q, k*wp] (k-major: candidate j's ``wp`` words at
    [j*wp, (j+1)*wp), 32/bits code values per word — ops/packed.py
    pack_words); qq f32 [Q, (32/bits)*128] from ``words_query_planes``
    (the pre-scaled query, plane-split and G-tiled). Returns f32 [Q, k] dots
    — the caller applies the metric algebra (−dots for IP, nbr_sq − 2·dots
    for L2) in XLA-land where it fuses into the following beam update.

    Same contraction as ``packed_row_dist`` but the rows travel as int32:
    the v5e gather engine moves 8 KB rows ~1.4x faster as int32 than as
    uint8 (scripts/rowgather_probe.py), which matters because the row
    gather feeding this kernel is 70% of the production hop.
    """
    q, row_w = words.shape
    assert row_w == k * wp, (row_w, k, wp)
    g = 128 // wp
    assert wp * g == 128 and k % g == 0, (wp, g, k)
    vpw = 32 // bits
    gp = max(8, g)
    # 0/1 segment selector: column c sums the wp lanes of segment c
    s = (jnp.arange(128, dtype=jnp.int32)[:, None] // wp
         == jnp.arange(gp, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    bq = min(bq, q)
    assert q % bq == 0, (q, bq)
    rr_blk = bq * k // g
    dots = pl.pallas_call(
        functools.partial(_words_dist_kernel, k=k, wp=wp, bits=bits, g=g),
        grid=(q // bq,),
        in_specs=[pl.BlockSpec((bq, row_w), lambda i: (i, 0)),
                  pl.BlockSpec((bq, vpw * 128), lambda i: (i, 0)),
                  pl.BlockSpec((128, gp), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((rr_blk, gp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((q * k // g, gp), jnp.float32),
        interpret=interpret,
    )(words, qq, s)
    # out row r = query (r // (k/g)) segment-group (r % (k/g)); col c < g is
    # the c-th candidate of the group -> [:, :g] reshape is candidate-order
    return dots[:, :g].reshape(q, k)


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
    Q not a multiple of the block size is zero-padded (a streaming copy of
    the operands — callers on hot paths should keep Q block-aligned, e.g.
    the fused beam's 512-padded batches).
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
    qn = q
    pad = (-q) % bq
    if pad:
        vecs = jnp.pad(vecs, ((0, pad), (0, 0), (0, 0)))
        qs = jnp.pad(qs, ((0, pad), (0, 0)))
        q = q + pad
    has_dq = dequant is not None
    if has_dq:
        off = jnp.asarray(dequant[0], jnp.float32).reshape(1, d)
        sc = jnp.asarray(dequant[1], jnp.float32).reshape(1, d)
    else:  # fixed arity: pass identity affine, branch is static
        off = jnp.zeros((1, d), jnp.float32)
        sc = jnp.ones((1, d), jnp.float32)
    out = pl.pallas_call(
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
    return out[:qn] if pad else out
