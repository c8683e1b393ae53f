"""Fused beam-update kernel (ops/beam_kernel.py): semantics vs a NumPy
reference of the per-hop contract, and end-to-end parity of the fused
search path against the legacy beam (interpret mode on the CPU backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hnsw_tpu import HnswConfig, HnswIndex
from hnsw_tpu.ops.beam_kernel import beam_update
from hnsw_tpu.utils.datasets import synthetic_workload


def _ref_update(buf_d, buf_p, cand_i, cand_d, ef_live):
    """NumPy reference of one hop: membership dedup, top-ef merge,
    ef_live mask, nearest-unexpanded selection + expansion mark."""
    ef, qn = buf_d.shape
    K = cand_i.shape[0]
    out_d = np.full_like(buf_d, np.inf)
    out_p = np.full_like(buf_p, -1)
    cur = np.full(qn, -1, np.int32)
    ndis = np.zeros(qn, np.int32)
    for q in range(qn):
        in_buf = set((buf_p[:, q] >> 1).tolist())
        entries = [(buf_d[i, q], int(buf_p[i, q])) for i in range(ef)]
        for k in range(K):
            cid = int(cand_i[k, q])
            if cid < 0 or cid in in_buf:
                continue
            ndis[q] += 1
            entries.append((float(cand_d[k, q]), cid << 1))
        entries.sort(key=lambda t: t[0])
        entries = entries[:ef]
        for i in range(ef):
            if i >= ef_live:
                entries[i] = (np.inf, -1)
        for i, (d, p) in enumerate(entries):
            if (p & 1) == 0 and d < np.inf:
                cur[q] = p >> 1
                entries[i] = (d, p | 1)
                break
        for i, (d, p) in enumerate(entries):
            out_d[i, q], out_p[i, q] = d, p
    return out_d, out_p, cur, ndis


@pytest.mark.parametrize("ef,K,ef_live", [(64, 64, 64), (32, 64, 32),
                                          (64, 64, 48), (128, 48, 100)])
def test_beam_update_matches_reference(ef, K, ef_live):
    qn = 128
    rng = np.random.default_rng(ef * 1000 + K)
    n_fill = rng.integers(1, ef, qn)
    buf_d = np.full((ef, qn), np.inf, np.float32)
    buf_p = np.full((ef, qn), -1, np.int32)
    for q in range(qn):
        nf = n_fill[q]
        buf_d[:nf, q] = np.sort(rng.standard_normal(nf).astype(np.float32))
        ids = rng.choice(1 << 20, nf, replace=False).astype(np.int32)
        buf_p[:nf, q] = (ids << 1) | (rng.random(nf) < 0.5)
    cand_i = rng.choice(1 << 20, (K, qn)).astype(np.int32)
    dupmask = rng.random((K, qn)) < 0.2
    for q in range(qn):            # duplicates of in-buffer ids + invalids
        kk = np.where(dupmask[:, q])[0]
        if len(kk) and n_fill[q] > 0:
            cand_i[kk, q] = buf_p[rng.integers(0, n_fill[q], len(kk)),
                                  q] >> 1
    cand_i[rng.random((K, qn)) < 0.15] = -1
    cand_d = rng.standard_normal((K, qn)).astype(np.float32)

    od, op, cur, ndis = beam_update(
        jnp.asarray(buf_d), jnp.asarray(buf_p), jnp.asarray(cand_i),
        jnp.asarray(cand_d), jnp.int32(ef_live), ef=ef, bq=128,
        interpret=True)
    rd, rp, rcur, rndis = _ref_update(buf_d, buf_p, cand_i, cand_d, ef_live)
    od, op = np.asarray(od), np.asarray(op)
    assert np.array_equal(np.asarray(ndis), rndis)
    assert np.allclose(od, rd, equal_nan=True)
    assert np.array_equal(np.asarray(cur), rcur)
    # ties may reorder payloads within equal keys: compare (d, p) sets
    for q in range(qn):
        assert sorted(zip(od[:, q], op[:, q])) == \
            sorted(zip(rd[:, q], rp[:, q])), q


@pytest.fixture(scope="module")
def fused_workload():
    wl = synthetic_workload(1500, 24, n_queries=40, metric="l2", seed=5)
    cfg = HnswConfig(dim=24, m=8, metric="l2", capacity=2048,
                     ef_construction=60, ef_search=32, seed=3)
    idx = HnswIndex(config=cfg)
    idx.add(wl.base)
    return wl, idx


def test_fused_search_matches_legacy(fused_workload, monkeypatch):
    """The full fused path (padding, transposed state, kernel hops,
    extraction) returns the same results as the legacy beam."""
    wl, idx = fused_workload
    monkeypatch.setenv("HNSW_TPU_BEAM_KERNEL", "0")
    d0, i0 = idx.search(wl.queries, k=5)
    monkeypatch.setenv("HNSW_TPU_BEAM_KERNEL", "1")
    d1, i1 = idx.search(wl.queries, k=5)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(i0) == np.asarray(i1)).mean() > 0.99


def test_fused_search_with_stats_and_runtime_ef(fused_workload, monkeypatch):
    """Runtime ef + stats ride through the fused path; narrower ef_live
    behaves like a narrower buffer (recall drops or holds, never crashes)."""
    wl, idx = fused_workload
    monkeypatch.setenv("HNSW_TPU_BEAM_KERNEL", "1")
    d, i, stats = idx.search(wl.queries, k=5, ef_search=20, with_stats=True)
    assert int(stats.hops) > 0
    assert np.asarray(stats.ndis).min() > 0
    assert np.asarray(i).shape == (40, 5)
    # self-query sanity through the fused path
    dq, iq = idx.search(wl.base[:8], k=1, ef_search=24)
    assert (np.asarray(iq)[:, 0] == np.arange(8)).all()
    assert np.allclose(np.asarray(dq)[:, 0], 0.0, atol=1e-4)
