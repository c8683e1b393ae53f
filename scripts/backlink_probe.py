"""Back-link completeness lever (VERDICT.md r4 next-round item 6): every
1M build drops ~4.5k back-link pairs beyond the repair window
(build.py back-link repair, r_window=16) and lands at reciprocity0 ~0.93.
Does completing those links (r_window 32/64) buy recall at fixed ef —
i.e. a lower ef/hop count at the 0.95 target?

Recall is timing-insensitive, so this probe tolerates a contended host;
only the build_seconds printed here are contention-noisy (not published).

Usage: python scripts/backlink_probe.py  [BENCH_N/D/M/EFC, RW_SWEEP=16,32,64]
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
    sweep = tuple(int(w) for w in
                  os.environ.get("RW_SWEEP", "16,32,64").split(","))

    wl = synthetic_workload(n, d, n_queries=nq, metric="l2", seed=1234,
                            name=f"sift-shaped-{n}x{d}")
    queries = wl.queries

    gt = None
    rows = []
    for rw in sweep:
        cap = 1 << (n - 1).bit_length()
        idx = hnsw_tpu.HnswIndex(d, m, "l2", capacity=max(cap, 1024),
                                 ef_construction=efc)
        idx.r_window = rw  # consumed by the lazily created DeviceBuilder
        t0 = time.time()
        idx.add(wl.base)
        build_s = time.time() - t0
        dropped = idx._builder.last_backlink_dropped
        cs = idx.check(strict=False)
        rec0 = cs.get("reciprocity0", 0.0)
        print(f"[backlink] r_window={rw}: build {build_s:.1f}s (contended-"
              f"noisy), dropped={dropped}, reciprocity0={rec0:.4f}, "
              f"errors={len(cs['errors'])}", flush=True)

        if gt is None:
            flat = hnsw_tpu.FlatIndex(d, "l2")
            flat.add(wl.base)
            _, gt = flat.search(queries, 10)
            gt = np.asarray(gt)
            del flat
        queries_dev = jnp.asarray(np.asarray(queries, np.float32))
        recalls = {}
        # fixed op-point shapes: the headline (ef=64, hops=58) plus the
        # neighbors that would move if the lever works
        for ef, hops in ((48, 48), (56, 52), (64, 58), (64, 0)):
            _, ii = idx.search(queries_dev, k=10, ef_search=ef,
                               max_hops=hops, device_out=True)  # 0 = auto
            r = recall_at_k(np.asarray(ii), gt, 10)
            recalls[f"ef={ef},hops={hops or 'auto'}"] = round(float(r), 4)
            print(f"[backlink]   ef={ef} hops={hops or 'auto'} "
                  f"recall@10={r:.4f}", flush=True)
        rows.append(dict(r_window=rw, dropped=int(dropped),
                         reciprocity0=round(float(rec0), 4), **recalls))
        del idx
    print(rows, flush=True)


if __name__ == "__main__":
    main()
