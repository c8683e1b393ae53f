"""Packed neighbor-code serving mode (ops/packed.py): quantization
correctness, routing-distance algebra, end-to-end recall parity with the
unpacked beam, and API semantics (invalidation, use_packed)."""

import numpy as np
import jax.numpy as jnp
import pytest

import hnsw_tpu
from hnsw_tpu.ops.packed import (
    PackedNeighbors, _pack_nibbles, make_packed_expand, pack_neighbors,
    quantization_params, quantize_codes, unpack_nibbles,
)
from hnsw_tpu.utils.datasets import synthetic_workload
from hnsw_tpu.utils.recall import recall_at_k


def _small_index(n=3000, d=24, m=8, metric="l2", seed=11):
    wl = synthetic_workload(n, d, n_queries=256, metric=metric, seed=seed)
    idx = hnsw_tpu.HnswIndex(d, m, metric, capacity=4096, ef_construction=80)
    idx.add(wl.base)
    return idx, wl


# ---------------------------------------------------------------------------
# quantization primitives
# ---------------------------------------------------------------------------

def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(500, 16)).astype(np.float32) * 3.0)
    live = jnp.ones((500,), bool)
    for bits in (8, 4):
        off, scale = quantization_params(v, live, bits)
        codes = quantize_codes(v, off, scale, bits)
        xhat = np.asarray(off + scale * codes.astype(jnp.float32))
        err = np.abs(xhat - np.asarray(v))
        # max error is half a quantization step per dim
        assert (err <= np.asarray(scale)[None, :] * 0.5 + 1e-5).all(), bits


def test_quantization_handles_constant_dims():
    v = jnp.asarray(np.stack([np.ones(100), np.linspace(0, 1, 100)], 1)
                    .astype(np.float32))
    off, scale = quantization_params(v, jnp.ones((100,), bool), 8)
    codes = quantize_codes(v, off, scale, 8)
    xhat = np.asarray(off + scale * codes.astype(jnp.float32))
    np.testing.assert_allclose(xhat[:, 0], 1.0, atol=1e-5)


def test_nibble_pack_roundtrip():
    rng = np.random.default_rng(1)
    for d in (8, 7):  # even and odd dims
        codes = jnp.asarray(rng.integers(0, 16, size=(5, 3, d), dtype=np.uint8))
        packed = _pack_nibbles(codes)
        assert packed.shape[-1] == (d + 1) // 2
        out = unpack_nibbles(packed, d)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


# ---------------------------------------------------------------------------
# routing distance algebra
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_packed_distances_match_dequantized(metric):
    """expand()'s code-row distances must equal the surrogate distance on the
    dequantized vectors plus the documented per-query constant shift."""
    rng = np.random.default_rng(2)
    n, d, m0 = 200, 12, 8
    vecs = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    nbrs = jnp.asarray(rng.integers(0, n, size=(n, m0), dtype=np.int32))
    levels = jnp.zeros((n,), jnp.int32)
    pk = pack_neighbors(nbrs, vecs, levels, bits=8)

    q = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    expand, shift = make_packed_expand(pk, nbrs, q, metric)
    cur = jnp.asarray(rng.integers(0, n, size=(4, 1), dtype=np.int32))
    out_nbrs, dist = expand(cur, jnp.ones((4, 1), bool))
    np.testing.assert_array_equal(np.asarray(out_nbrs[:, 0]),
                                  np.asarray(nbrs)[np.asarray(cur[:, 0])])

    # reference: dequantize and compute the surrogate + shift by hand
    off, scale = pk.offset, pk.scale
    codes = quantize_codes(vecs, off, scale, 8)
    xhat = np.asarray(off + scale * codes.astype(jnp.float32))
    qn = np.asarray(q)
    for qi in range(4):
        ids = np.asarray(nbrs)[int(cur[qi, 0])]
        x = xhat[ids]
        if metric == "ip":
            ref = -(x @ qn[qi])
        else:
            ref = (x * x).sum(1) - 2 * x @ qn[qi]
        np.testing.assert_allclose(np.asarray(dist[qi]),
                                   ref + np.asarray(shift)[qi], rtol=2e-4,
                                   atol=2e-4)


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_packed_search_recall_parity(metric):
    idx, wl = _small_index(metric=metric)
    flat = hnsw_tpu.FlatIndex(wl.base.shape[1], metric)
    flat.add(wl.base)
    _, gt = flat.search(wl.queries, 10)

    d0, i0 = idx.search(wl.queries, 10, ef_search=64)
    r0 = recall_at_k(i0, np.asarray(gt), 10)

    nbytes = idx.enable_packed(bits=8)
    assert nbytes > 0 and idx.packed_enabled
    d8, i8 = idx.search(wl.queries, 10, ef_search=64)
    r8 = recall_at_k(i8, np.asarray(gt), 10)
    assert r8 >= r0 - 0.02, (r8, r0)

    # returned distances are EXACT (rerank): rows that agree with the
    # unpacked search must carry identical distances
    same = np.asarray(i8) == np.asarray(i0)
    np.testing.assert_allclose(np.asarray(d8)[same], np.asarray(d0)[same],
                               rtol=1e-5, atol=1e-5)

    # 4-bit routing is coarser; the documented contract is that the loss is
    # absorbed by efSearch — verify it reaches the 8-bit ef=64 level at 2x ef
    idx.enable_packed(bits=4)
    _, i4 = idx.search(wl.queries, 10, ef_search=128)
    r4 = recall_at_k(i4, np.asarray(gt), 10)
    assert r4 >= r0 - 0.02, (r4, r0)


def test_packed_invalidated_by_add_and_use_packed_flag():
    idx, wl = _small_index(n=1000)
    idx.enable_packed()
    assert idx.packed_enabled
    idx.add(wl.base[:8])  # any growth invalidates the packed tables
    assert not idx.packed_enabled
    with pytest.raises(ValueError, match="use_packed"):
        idx.search(wl.queries[:4], 5, use_packed=True)
    # bypass works whether or not packing is enabled
    d, i = idx.search(wl.queries[:4], 5, use_packed=False)
    assert i.shape == (4, 5)


def test_packed_composes_with_filters_and_deletion():
    idx, wl = _small_index(n=1500)
    flat = hnsw_tpu.FlatIndex(wl.base.shape[1], "l2")
    flat.add(wl.base)
    _, gt = flat.search(wl.queries, 1)
    victim = int(gt[0, 0])

    idx.enable_packed()
    idx.remove_ids(np.asarray([victim]))
    assert idx.packed_enabled  # deletion filters results, not routing
    d, i = idx.search(wl.queries[:1], 5, ef_search=64)
    assert victim not in i[0]

    allowed = np.zeros(idx.config.capacity, bool)
    allowed[:200] = True
    d, i = idx.search(wl.queries[:8], 5, ef_search=128, allowed=allowed)
    valid = i[i >= 0]
    assert (valid < 200).all()


def test_pack_neighbors_memory_guard():
    rng = np.random.default_rng(3)
    vecs = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    nbrs = jnp.asarray(rng.integers(0, 64, size=(64, 4), dtype=np.int32))
    levels = jnp.zeros((64,), jnp.int32)
    with pytest.raises(ValueError, match="budget"):
        pack_neighbors(nbrs, vecs, levels, bits=8, max_bytes=10)
