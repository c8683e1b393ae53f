import numpy as np
import jax.numpy as jnp
import pytest

from hnsw_tpu.ops.distances import brute_force_topk, pairwise_distances, true_l2

from conftest import exact_knn


@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_brute_force_matches_numpy(metric):
    rng = np.random.default_rng(0)
    base = rng.normal(size=(500, 24)).astype(np.float32)
    q = rng.normal(size=(40, 24)).astype(np.float32)
    d, i = brute_force_topk(jnp.asarray(q), jnp.asarray(base), k=10,
                            metric=metric)
    td, ti = exact_knn(base, q, 10, metric)
    # float32 near-ties may permute ids; compare as sets + by distance value
    from hnsw_tpu.utils.recall import recall_at_k
    assert recall_at_k(np.asarray(i), ti, 10) >= 0.98
    # ||x||^2 - 2 q·x in f32 carries ~1e-3 relative cancellation error
    np.testing.assert_allclose(np.asarray(d), td, rtol=5e-3, atol=5e-3)


def test_tiled_matches_untiled():
    rng = np.random.default_rng(1)
    base = rng.normal(size=(1000, 16)).astype(np.float32)
    q = rng.normal(size=(30, 16)).astype(np.float32)
    d1, i1 = brute_force_topk(jnp.asarray(q), jnp.asarray(base), k=7,
                              metric="l2", tile_n=128)
    d2, i2 = brute_force_topk(jnp.asarray(q), jnp.asarray(base), k=7,
                              metric="l2", tile_n=100000)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
    assert (np.asarray(i1) == np.asarray(i2)).all()


def test_query_tiling():
    rng = np.random.default_rng(2)
    base = rng.normal(size=(300, 8)).astype(np.float32)
    q = rng.normal(size=(50, 8)).astype(np.float32)
    d1, i1 = brute_force_topk(jnp.asarray(q), jnp.asarray(base), k=5,
                              metric="l2", tile_q=16, tile_n=64)
    d2, i2 = brute_force_topk(jnp.asarray(q), jnp.asarray(base), k=5,
                              metric="l2")
    assert (np.asarray(i1) == np.asarray(i2)).all()


def test_l2_surrogate_plus_qnorm_is_true_l2():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(64, 12)).astype(np.float32)
    q = rng.normal(size=(9, 12)).astype(np.float32)
    surro = pairwise_distances(jnp.asarray(q), jnp.asarray(base), "l2")
    full = true_l2(surro, jnp.asarray(q))
    expect = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(full), expect, rtol=2e-4, atol=2e-4)


def test_k_larger_than_n_pads():
    base = np.eye(4, dtype=np.float32)
    q = np.zeros((2, 4), np.float32)
    d, i = brute_force_topk(jnp.asarray(q), jnp.asarray(base), k=6, metric="l2")
    assert np.asarray(i).shape == (2, 6)
    assert (np.asarray(i)[:, 4:] == -1).all()
