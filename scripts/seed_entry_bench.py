"""Race entry_mode="seed" against the default "sample" at the SIFT1M
north-star op point (VERDICT.md r4 item 4 / next-round item 4).

"seed" pre-fills the fused beam with ef/2 stratified entry candidates
(ops/beam.py:300-346) instead of a single global-argmin entry; the open
question is whether the richer init lowers the tuned hop cap at >= 0.95
recall@10 enough to beat "sample" on wall clock. One build serves both
modes (entry selection is a search-time knob).

Honest timing requires a quiet host: run alone (the 1-core VM serializes
dispatch with anything else running).

Usage: python scripts/seed_entry_bench.py  [BENCH_N/D/M/EFC env knobs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-l1")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import hnsw_tpu
    from hnsw_tpu.utils.datasets import synthetic_workload
    from hnsw_tpu.utils.recall import recall_at_k

    n = int(os.environ.get("BENCH_N", 1_000_000))
    d = int(os.environ.get("BENCH_D", 128))
    m = int(os.environ.get("BENCH_M", 32))
    efc = int(os.environ.get("BENCH_EFC", 100))
    nq = int(os.environ.get("BENCH_Q", 8192))
    n_probe = 2048
    target = float(os.environ.get("BENCH_TARGET_RECALL", 0.95))
    reps = int(os.environ.get("BENCH_REPS", 3))

    wl = synthetic_workload(n, d, n_queries=nq + n_probe, metric="l2",
                            seed=1234, name=f"sift-shaped-{n}x{d}")
    queries = wl.queries[:nq]
    probe_q = wl.queries[nq:]

    cap = 1 << (n - 1).bit_length()
    idx = hnsw_tpu.HnswIndex(d, m, "l2", capacity=max(cap, 1024),
                             ef_construction=efc)
    t0 = time.time()
    idx.add(wl.base)
    print(f"[seed-bench] build: {time.time()-t0:.1f}s", flush=True)

    flat = hnsw_tpu.FlatIndex(d, "l2")
    flat.add(wl.base)
    _, gt = flat.search(queries, 10)
    gt = np.asarray(gt)
    del flat

    nb = idx.enable_packed(bits=8)
    print(f"[seed-bench] packed table: {nb/1e9:.2f} GB", flush=True)

    queries_dev = jnp.asarray(np.asarray(queries, np.float32))
    probe_dev = jnp.asarray(np.asarray(probe_q, np.float32))

    rows = []
    for mode in ("sample", "seed"):
        idx.entry_mode = mode
        ef, hops = idx.tune_operating_point(probe_dev, target, k=10,
                                            set_default=False)
        # warm + measure at the tuned point on the reported query set
        _, ii = idx.search(queries_dev, k=10, ef_search=ef, max_hops=hops,
                           device_out=True)
        np.asarray(ii)[:1]
        times = []
        for _ in range(reps):
            t0 = time.time()
            _, ii = idx.search(queries_dev, k=10, ef_search=ef,
                               max_hops=hops, device_out=True)
            np.asarray(ii.ravel()[:1])
            times.append(time.time() - t0)
        r = recall_at_k(np.asarray(ii), gt, 10)
        qps = len(queries) / min(times)
        rows.append(dict(mode=mode, ef=ef, max_hops=hops,
                         recall=round(float(r), 4), qps=round(qps, 1)))
        print(f"[seed-bench] mode={mode:6s} ef={ef} hops={hops} "
              f"recall@10={r:.4f} qps={qps:,.0f}", flush=True)
    print(rows, flush=True)


if __name__ == "__main__":
    main()
