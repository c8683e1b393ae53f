"""Pallas routing-distance kernels (ops/dist_kernel.py) vs the plain XLA
formulation, in interpret mode — including the lane-alignment pad shapes
(d not a multiple of 128: d=64/96/100) and the 4-bit nibble-plane path,
which only ever run padded on real hardware (Mosaic requires the in-kernel
shape cast's lane dim % 128 == 0; see the kernel wrappers)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_tpu.ops.dist_kernel import gathered_vec_dist, packed_row_dist


def _surrogate(qs, vecs, metric, sq=None):
    dots = np.einsum("qd,qkd->qk", qs, vecs)
    if metric == "ip":
        return -dots
    if sq is None:
        sq = np.einsum("qkd,qkd->qk", vecs, vecs)
    return sq - 2.0 * dots


@pytest.mark.parametrize("d", [64, 96, 100, 128])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_packed_row_dist_8bit(d, metric):
    rng = np.random.default_rng(d)
    q, k = 256, 16
    codes = rng.integers(0, 256, size=(q, k, d), dtype=np.uint8)
    qs = rng.normal(size=(q, d)).astype(np.float32)
    sq = rng.uniform(1, 10, size=(q, k)).astype(np.float32)
    out = packed_row_dist(jnp.asarray(codes.reshape(q, k * d)),
                          jnp.asarray(qs), jnp.asarray(sq),
                          k=k, bits=8, metric=metric, interpret=True)
    ref = _surrogate(qs, codes.astype(np.float32), metric, sq=sq)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-2)


@pytest.mark.parametrize("d", [64, 96, 100, 128])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_packed_row_dist_4bit(d, metric):
    rng = np.random.default_rng(100 + d)
    q, k = 256, 16
    db = (d + 1) // 2
    vals = rng.integers(0, 16, size=(q, k, d), dtype=np.uint8)
    if d % 2:  # odd d: the missing odd dim contributes 0
        padded = np.concatenate(
            [vals, np.zeros((q, k, 1), np.uint8)], axis=2)
    else:
        padded = vals
    lo, hi = padded[..., 0::2], padded[..., 1::2]
    rows = (lo | (hi << 4)).reshape(q, k * db)
    qs = rng.normal(size=(q, d)).astype(np.float32)
    sq = rng.uniform(1, 10, size=(q, k)).astype(np.float32)
    out = packed_row_dist(jnp.asarray(rows), jnp.asarray(qs),
                          jnp.asarray(sq), k=k, bits=4, metric=metric,
                          interpret=True)
    ref = _surrogate(qs, vals.astype(np.float32), metric, sq=sq)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-2)


@pytest.mark.parametrize("d", [64, 96, 128])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_gathered_vec_dist(d, metric):
    rng = np.random.default_rng(200 + d)
    q, k = 256, 16
    vecs = rng.normal(size=(q, k, d)).astype(np.float32)
    qs = rng.normal(size=(q, d)).astype(np.float32)
    out = gathered_vec_dist(jnp.asarray(vecs), jnp.asarray(qs),
                            metric=metric, interpret=True)
    ref = _surrogate(qs, vecs, metric)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("d", [96, 128])
def test_gathered_vec_dist_sq8_dequant(d):
    """Padded dims must stay exactly 0 through the dequant affine (offset
    and scale are zero-padded in the wrapper), or Σv² picks up garbage."""
    rng = np.random.default_rng(300 + d)
    q, k = 256, 8
    codes = rng.integers(0, 256, size=(q, k, d), dtype=np.uint8)
    off = rng.normal(size=(d,)).astype(np.float32)
    sc = rng.uniform(0.01, 0.1, size=(d,)).astype(np.float32)
    qs = rng.normal(size=(q, d)).astype(np.float32)
    out = gathered_vec_dist(jnp.asarray(codes), jnp.asarray(qs),
                            (jnp.asarray(off), jnp.asarray(sc)),
                            metric="l2", interpret=True)
    vhat = off + sc * codes.astype(np.float32)
    ref = _surrogate(qs, vhat, "l2")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)
