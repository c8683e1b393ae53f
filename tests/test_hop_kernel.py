"""Parity for the flag-gated Pallas fused gather+distance kernel (interpret
mode on CPU; the same kernel compiles on TPU). Keeps the XLA-vs-Pallas
comparison honest (ARCHITECTURE.md 'gather roofline')."""

import numpy as np
import pytest
import jax.numpy as jnp

from hnsw_tpu.ops.hop_kernel import BLOCK_Q, fused_gather_distances


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_matches_xla_path(metric):
    rng = np.random.default_rng(0)
    cap, d, Q, K = 512, 128, 2 * BLOCK_Q, 16
    vecs = jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, cap, size=(Q, K), dtype=np.int32))
    qs = jnp.asarray(rng.normal(size=(Q, d)).astype(np.float32))

    got = np.asarray(fused_gather_distances(vecs, ids, qs, metric,
                                            interpret=True))

    v = np.asarray(vecs)[np.asarray(ids)]          # [Q, K, d]
    dots = np.einsum("qd,qkd->qk", np.asarray(qs), v)
    want = -dots if metric == "ip" else (v ** 2).sum(-1) - 2.0 * dots
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_negative_ids_clamped():
    rng = np.random.default_rng(1)
    cap, d, Q, K = 64, 128, BLOCK_Q, 4
    vecs = jnp.asarray(rng.normal(size=(cap, d)).astype(np.float32))
    ids = jnp.full((Q, K), -1, jnp.int32)
    qs = jnp.asarray(rng.normal(size=(Q, d)).astype(np.float32))
    got = np.asarray(fused_gather_distances(vecs, ids, qs, "l2",
                                            interpret=True))
    v0 = np.asarray(vecs)[0]
    want = (v0 ** 2).sum() - 2.0 * np.asarray(qs) @ v0
    np.testing.assert_allclose(got, np.repeat(want[:, None], K, 1),
                               rtol=1e-5, atol=1e-4)


def test_search_parity_under_flag(host_index, small_workload, monkeypatch):
    """End-to-end: the flag-gated kernel path returns the same neighbors as
    the default XLA path (d=32 is not 128-aligned -> also exercises the
    fallback gate; use a padded 128-d index for the kernel run)."""
    monkeypatch.setenv("HNSW_TPU_PALLAS_HOP", "1")
    import jax.numpy as jnp
    from hnsw_tpu.search import hnsw_search, compute_sqnorms

    g = host_index.to_graph_arrays()
    v = jnp.asarray(host_index.vectors)
    q = jnp.asarray(small_workload.queries[:16])
    # pad d 32 -> 128 with zeros: distances unchanged
    vp = jnp.pad(v, ((0, 0), (0, 96)))
    qp = jnp.pad(q, ((0, 0), (0, 96)))
    monkeypatch.setenv("HNSW_TPU_PALLAS_HOP", "0")
    d0, i0 = hnsw_search(g, vp, compute_sqnorms(vp), qp, k=5, ef_search=32)
    monkeypatch.setenv("HNSW_TPU_PALLAS_HOP", "1")
    import hnsw_tpu.ops.hop_kernel as hk
    import jax
    orig = hk.fused_gather_distances

    def interp(vec, ids, qs, metric="l2", interpret=False):
        return orig(vec, ids, qs, metric, interpret=True)  # CPU: interpret
    monkeypatch.setattr(hk, "fused_gather_distances", interp)
    d1, i1 = hnsw_search(g, vp, compute_sqnorms(vp), qp, k=5, ef_search=32)
    assert np.array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-4, atol=1e-4)
