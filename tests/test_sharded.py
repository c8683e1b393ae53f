"""Sharded build + query fan-out/merge (C14) on the faked 8-device CPU mesh
(SURVEY.md §4 item 5)."""

import numpy as np
import pytest
import jax

from hnsw_tpu.parallel.sharded import ShardedHnswIndex, make_mesh
from hnsw_tpu.utils.datasets import synthetic_workload
from hnsw_tpu.utils.recall import recall_at_k

from conftest import exact_knn


@pytest.fixture(scope="module")
def sharded_built():
    mesh = make_mesh(n_shards=4, q_parallel=2)
    wl = synthetic_workload(4000, 16, n_queries=128, metric="l2", seed=31)
    idx = ShardedHnswIndex(16, 8, "l2", mesh=mesh, capacity_per_shard=2048,
                           ef_construction=60, seed=17)
    idx.add(wl.base)
    return idx, wl


def test_mesh_shapes():
    mesh = make_mesh(n_shards=4, q_parallel=2)
    assert mesh.shape == {"shard": 4, "q": 2}
    assert len(jax.devices()) == 8


def test_sharded_recall(sharded_built):
    idx, wl = sharded_built
    assert idx.ntotal == 4000
    _, gt = exact_knn(wl.base, wl.queries, 10, "l2")
    d, i = idx.search(wl.queries, k=10, ef_search=64)
    r = recall_at_k(i, gt, 10)
    # 4 sub-indexes of 1k each, global merge: recall should match or beat a
    # single index (each shard is easier to search exhaustively)
    assert r >= 0.95, r


def test_user_ids_are_insertion_order(sharded_built):
    idx, wl = sharded_built
    # self-query: every database point must find itself under its USER id
    d, i = idx.search(wl.base[:64], k=1, ef_search=32)
    assert (i[:, 0] == np.arange(64)).mean() > 0.95
    assert (d[:, 0] < 1e-3).mean() > 0.95


def test_results_sorted_and_unique(sharded_built):
    idx, wl = sharded_built
    d, i = idx.search(wl.queries[:32], k=10)
    assert (np.diff(d, axis=1) >= -1e-6).all()  # ascending merge
    for row in i:
        vals = row[row >= 0]
        assert len(set(vals.tolist())) == len(vals)  # shards are disjoint


def test_query_padding(sharded_built):
    idx, wl = sharded_built
    # query count not divisible by the q axis (2): padding must be invisible
    d, i = idx.search(wl.queries[:7], k=5)
    assert i.shape == (7, 5)
    d2, i2 = idx.search(wl.queries[:8], k=5)
    assert (i == i2[:7]).all()


def test_empty_and_errors():
    mesh = make_mesh(n_shards=4, q_parallel=2)
    idx = ShardedHnswIndex(8, 4, mesh=mesh, capacity_per_shard=64)
    d, i = idx.search(np.zeros((3, 8), np.float32), k=2)
    assert (i == -1).all()
    with pytest.raises(ValueError, match="expected"):
        idx.add(np.zeros((4, 9), np.float32))


def test_sharded_save_load(tmp_path, sharded_built):
    idx, wl = sharded_built
    d1, i1 = idx.search(wl.queries[:32], k=5)
    p = str(tmp_path / "sharded.npz")
    idx.save(p)
    from hnsw_tpu.parallel.sharded import ShardedHnswIndex
    idx2 = ShardedHnswIndex.load(p, mesh=idx.mesh)
    assert idx2.ntotal == idx.ntotal
    d2, i2 = idx2.search(wl.queries[:32], k=5)
    assert (i1 == i2).all()
    import numpy as np
    np.testing.assert_array_equal(d1, d2)
    # resumed adds keep working
    import numpy as _np
    extra = _np.asarray(wl.base[:8], _np.float32) + 0.01
    idx2.add(extra)
    assert idx2.ntotal == idx.ntotal + 8


def test_sharded_invariants(sharded_built):
    idx, _ = sharded_built
    for st in idx.check():
        assert st["errors"] == []
