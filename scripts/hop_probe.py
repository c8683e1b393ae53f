"""Marginal per-hop cost at serving shape: regress batch time on hop cap
at fixed ef, for each kernel on/off combination. 200k index (per-hop cost
is ~graph-size independent for kernel time; gather locality differs a bit
from 1M but the slope decomposition is what we want)."""
import os, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-l1")
import jax.numpy as jnp
from hnsw_tpu import HnswIndex
from hnsw_tpu.utils.datasets import synthetic_workload

N, D, Q, EF = 200_000, 128, 8192, 64
wl = synthetic_workload(N, D, n_queries=Q, metric="l2", seed=3)
idx = HnswIndex(D, 32, "l2", capacity=1 << 18, ef_construction=100, seed=1)
t0 = time.time(); idx.add(wl.base); print(f"build {time.time()-t0:.1f}s", flush=True)
idx.enable_packed(8)
q = jnp.asarray(wl.queries)

HOPS = [8, 16, 24, 32, 48, 64]

def timed(max_hops):
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        d, i = idx.search(q, 10, ef_search=EF, max_hops=max_hops,
                          device_out=True)
        np.asarray(d.ravel()[:1])  # 1-element sync
        best = min(best, time.time() - t0)
    return best * 1e3

for dist_k, beam_k in [("1", "1"), ("0", "1"), ("1", "0"), ("0", "0")]:
    os.environ["HNSW_TPU_DIST_KERNEL"] = dist_k
    os.environ["HNSW_TPU_BEAM_KERNEL"] = beam_k
    ts = []
    for h in HOPS:
        ts.append(timed(h))
    a = np.polyfit(HOPS, ts, 1)
    print(f"dist_kernel={dist_k} beam_kernel={beam_k}: "
          + " ".join(f"{h}:{t:.1f}ms" for h, t in zip(HOPS, ts))
          + f"  slope={a[0]:.3f} ms/hop intercept={a[1]:.1f} ms", flush=True)
