"""Benchmark harness (SURVEY.md §2b C15): build + query an HNSW index on the
real chip, sweep efSearch for the recall@10 >= 0.95 operating point, report
QPS there.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": r}

vs_baseline = our QPS / single-core CPU HNSW QPS at the same recall on the
same data (BASELINE.json north star: >=10x faiss single-core per chip). The
CPU baseline is the bundled C++ single-core engine (hnsw_tpu/native) when
built, else faiss-cpu if importable, else None.

Robustness (round-1 lesson: a degraded tunnel recorded 1.117x where a clean
rerun measured 7x): every sweep point is best-of-BENCH_REPS synced reps, and
an environment self-diagnostic (device kind, gather Mrows/s, H2D MB/s,
per-dispatch sync ms) is embedded in the detail line so a degraded
environment is VISIBLE in the artifact instead of silently recorded. If the
probe detects a badly degraded environment the workload downsizes and says
so.

Env knobs:
  BENCH_N       database size        (default 1_000_000 — the north-star
                config, BASELINE.json; auto-downsized to 100_000 if the
                environment probe fails thresholds)
  BENCH_D       dimensionality       (default 128; SIFT-shaped)
  BENCH_Q       query count          (default 8192)
  BENCH_M       HNSW M               (default 32)
  BENCH_EFC     efConstruction       (default 100)
  BENCH_REPS    timing reps per sweep point (default 3, best-of)
  BENCH_CPU_N   CPU-baseline build size (default = BENCH_N)
  BENCH_DATASET named eval config (sift10k/sift1m/gist1m/glove100) overrides
                N/D and uses real files under $HNSW_TPU_DATA when present
  BENCH_DTYPE   vector storage codec (float32 default | sq8) — sq8 is the
                Deep10M-scale configuration (vectors at 1 byte/dim; recall
                is still measured against the TRUE f32 ground truth)
  BENCH_PACKED  auto (default) | 0 | 8 | 4 | pq — packed serving rows;
                "pq" packs PQ ROUTING codes (BENCH_PQ_M sub-codes x
                BENCH_PQ_BITS bits), the low-memory packed mode
"""

from __future__ import annotations

import json
import logging
import os
import platform
import sys
import time

import numpy as np

logging.basicConfig(stream=sys.stderr, level=logging.INFO,
                    format="[%(name)s] %(message)s")


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync_fetch(x):
    """Force completion honestly: fetch ONE element D2H. (block_until_ready
    alone under-reports on the tunneled axon backend.)"""
    import jax
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def env_diagnostic():
    """Measure the environment the bench is about to trust."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    info = {"device": str(jax.devices()[0]),
            "n_devices": len(jax.devices())}

    f = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8, 128))
    _sync_fetch(f(z))
    t0 = time.time()
    for _ in range(5):
        _sync_fetch(f(z))
    sync_s = (time.time() - t0) / 5
    info["sync_ms"] = round(sync_s * 1e3, 2)

    x = rng.normal(size=(2048, 512)).astype(np.float32)  # 4 MB
    jax.block_until_ready(jnp.asarray(x))
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(jnp.asarray(x))
    info["h2d_MBps"] = round(x.nbytes / ((time.time() - t0) / 3) / 1e6, 1)

    cap, ng = 1 << 18, 1 << 21
    tab = jnp.asarray(rng.normal(size=(cap, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, cap, size=(ng,), dtype=np.int32))
    g = jax.jit(lambda t, i: jnp.sum(t[i], axis=0))
    _sync_fetch(g(tab, ids))
    t0 = time.time()
    for _ in range(3):
        _sync_fetch(g(tab, ids))
    dt = max((time.time() - t0) / 3 - sync_s, 1e-9)
    info["gather_Mrows_s"] = round(ng / dt / 1e6, 1)
    del tab, ids

    # free-HBM probe: the dev chip is reachable through a SHARED tunnel —
    # a co-tenant can hold HBM (and contend for compute), which shows up as
    # multi-x build slowdowns and spurious RESOURCE_EXHAUSTED. Record what
    # is actually allocatable so a contended run is visible in the artifact.
    bufs = []
    try:
        for _ in range(15):
            bufs.append(jax.block_until_ready(
                jnp.zeros((1 << 28,), jnp.float32)))  # 1 GB each
    except Exception:  # noqa: BLE001 — allocation failure IS the signal
        pass
    info["free_hbm_GB"] = len(bufs)
    del bufs
    return info


def main():
    import jax
    try:  # persistent compile cache: repeated bench runs skip the big builds
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/jaxcache-l1"))
        # "-l1" = layout-epoch salt: the persistent cache on the remote-AOT
        # (axon) path does not key on pinned entry layouts, so executables
        # compiled before the row-major pinning (build.py
        # build_layout_formats) collide with post-pinning programs and
        # return outputs in the wrong layout (a jit-layout ValueError at
        # the next call). Bump the salt whenever pinned layouts change.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    import jax.numpy as jnp
    import hnsw_tpu
    from hnsw_tpu.utils.datasets import load_eval_workload, synthetic_workload
    from hnsw_tpu.utils.recall import recall_at_k
    from hnsw_tpu.utils.stats import HnswStats

    env = env_diagnostic()
    _log(f"[bench] environment: {json.dumps(env)}")

    n = int(os.environ.get("BENCH_N", 1_000_000))
    downsized = None
    if "BENCH_N" not in os.environ and (
            env["gather_Mrows_s"] < 20 or env["h2d_MBps"] < 5
            or env["sync_ms"] > 500):
        downsized = (f"environment probe failed thresholds "
                     f"(gather={env['gather_Mrows_s']} Mrows/s, "
                     f"h2d={env['h2d_MBps']} MB/s, sync={env['sync_ms']} ms)"
                     f" -> downsized to 100k")
        _log(f"[bench] WARNING: {downsized}")
        n = 100_000
    d = int(os.environ.get("BENCH_D", 128))
    nq = int(os.environ.get("BENCH_Q", 8192))
    m = int(os.environ.get("BENCH_M", 32))
    efc = int(os.environ.get("BENCH_EFC", 100))
    reps = int(os.environ.get("BENCH_REPS", 3))
    dataset = os.environ.get("BENCH_DATASET", "")
    target_recall = float(os.environ.get("BENCH_TARGET_RECALL", 0.95))

    # refinement probe: DISJOINT from the reported query set (VERDICT.md r3
    # item 8) — ask the workload for nq + n_probe queries and tune only on
    # the tail. If a real dataset ships fewer, the probe falls back to a
    # prefix overlap and the artifact says so.
    n_probe = int(os.environ.get("BENCH_PROBE_Q", 2048))
    if dataset:
        wl = load_eval_workload(dataset, n_queries=nq + n_probe)
    else:
        wl = synthetic_workload(n, d, n_queries=nq + n_probe, metric="l2",
                                seed=1234, name=f"sift-shaped-{n}x{d}")
    base = wl.base
    queries = wl.queries[:nq]
    probe_queries = wl.queries[nq:]
    probe_disjoint = len(probe_queries) > 0
    if not probe_disjoint:  # dataset had <= nq queries: overlap, flagged
        probe_queries = wl.queries[:min(len(wl.queries), n_probe)]
    n, d = base.shape
    _log(f"[bench] workload={wl.name} n={n} d={d} nq={len(queries)} "
         f"probe_nq={len(probe_queries)} (disjoint={probe_disjoint}) "
         f"metric={wl.metric} M={m} efC={efc}")

    # ---- build on device
    cap = 1 << (n - 1).bit_length()
    if cap >= 1 << 24:  # config caps per-index capacity below 2^24
        cap = n
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    kw = {}
    big = n >= 8_000_000
    if big:
        # deep10m HBM budget (see benchmarks/run_all.py): trim the
        # upper-table headroom 4x -> 2x to make room for program temps
        kw["upper_capacity"] = 2 * cap // m
    idx = hnsw_tpu.HnswIndex(d, m, wl.metric, capacity=max(cap, 1024),
                             ef_construction=efc, dtype=dtype, **kw)
    # BENCH_BEAM_KEYS=bf16 opts exact-storage routing into the cheap bf16
    # merge keys (index-level default; recall is measured honestly per
    # sweep point either way)
    idx.beam_keys = os.environ.get("BENCH_BEAM_KEYS", "auto")
    # BENCH_ENTRY_MODE=seed|sample|descend overrides the index default
    # ("auto" -> sample): seed pre-fills the fused beam with stratified
    # entry candidates, which can lower the hop cap the tuner lands on
    idx.entry_mode = os.environ.get("BENCH_ENTRY_MODE", "auto")
    t0 = time.time()
    if not idx.is_trained:  # sq8: train the quantizer on a sample
        idx.train(np.asarray(base[:262144], np.float32))
    # chunk large adds: each add() stages its schedule on device, so a
    # 10M-point single call would hold dataset + staging + graph in HBM
    add_chunk = len(base) if not big else 1_250_000
    for s in range(0, len(base), add_chunk):
        idx.add(base[s:s + add_chunk])
    build_s = time.time() - t0
    _log(f"[bench] device build: {build_s:.1f}s ({n/build_s:.0f} inserts/s)")
    bl_dropped = getattr(idx._builder, "last_backlink_dropped", 0)
    if bl_dropped:
        _log(f"[bench] back-link window drops this build: {bl_dropped} "
             f"({100.0 * bl_dropped / max(n * m, 1):.4f}% of forward links)")

    # ---- structural invariant check: costs ~30 s at 1M (host-side, D2H of
    # neighbors0), so by default it runs AFTER the parsed summary is emitted
    # (VERDICT.md r3 Weak #1/#6: the r03 artifact timed out before printing
    # the summary; the check's failure mode — post-build corruption — is
    # also caught by the measured recall + packed canary, which run before
    # the op point is recorded either way). BENCH_CHECK=pre restores the
    # pre-flight placement; =0 skips entirely.
    check_mode = os.environ.get("BENCH_CHECK", "post")

    def run_invariant_check():
        t0 = time.time()
        try:
            cs = idx.check(strict=False)
            cs["seconds"] = round(time.time() - t0, 1)
            _log(f"[bench] invariant check ({cs['seconds']}s): "
                 f"{len(cs['errors'])} errors, "
                 f"reciprocity0={cs.get('reciprocity0', 0):.3f}, "
                 f"deg0_mean={cs.get('deg0_mean', 0):.1f}")
            if cs["errors"]:
                _log(f"[bench] INVARIANT ERRORS: {cs['errors']}")
            return cs
        except Exception as e:  # noqa: BLE001 — diagnostic must not kill bench
            _log(f"[bench] invariant check crashed: {e!r}")
            return {"errors": [f"checker crashed: {e!r}"]}

    check_summary = None
    if check_mode == "pre" or check_mode == "1":
        check_summary = run_invariant_check()

    # ---- ground truth (on-chip brute force) unless the dataset ships one
    if wl.ground_truth is not None:
        gt = wl.ground_truth[:len(queries), :10]
    elif big:
        # from the index's own device-resident vectors: no second multi-GB
        # copy of base on device (run_all.py big-config pattern)
        t0 = time.time()
        _, gt = hnsw_tpu.brute_force_topk(
            jnp.asarray(np.asarray(queries, np.float32)), idx.vectors,
            k=10, metric=wl.metric, tile_n=16384, n_valid=n,
            dequant=idx._sq)
        gt = np.asarray(gt)
        _log(f"[bench] brute-force GT: {time.time()-t0:.1f}s")
    else:
        t0 = time.time()
        flat = hnsw_tpu.FlatIndex(d, wl.metric)
        flat.add(base)
        _, gt = flat.search(queries, 10)
        del flat  # release the oracle's device copy of base before packing
        _log(f"[bench] brute-force GT: {time.time()-t0:.1f}s")

    # ---- packed serving mode (ops/packed.py): route on neighbor-code rows
    # (one HBM transaction per expanded node) + exact rerank. Measured at
    # 1M x 128: 1.77x QPS at identical recall. Auto-enabled when the code
    # table leaves HBM headroom; BENCH_PACKED=0 disables, =4 forces 4-bit,
    # =pq packs PQ ROUTING codes instead (m0 * BENCH_PQ_M bytes/row,
    # 8-16x smaller — the Deep10M-scale configuration).
    packed_env = os.environ.get("BENCH_PACKED", "auto")
    packed_bits = 0
    packed_mode = None
    if packed_env == "pq":
        pq_m = int(os.environ.get("BENCH_PQ_M", max(d // 8, 1)))
        pq_bits = int(os.environ.get("BENCH_PQ_BITS", 8))
        t0 = time.time()
        try:
            nb = idx.enable_packed(mode="pq", pq_m=pq_m, pq_bits=pq_bits,
                                   train_x=np.asarray(
                                       base[:65536], np.float32))
            packed_bits = pq_bits
            packed_mode = f"pq{pq_m}x{pq_bits}"
            _log(f"[bench] packed-pq tables: {nb/1e9:.2f} GB "
                 f"(pq_m={pq_m}, {pq_bits}-bit) in {time.time()-t0:.1f}s")
        except Exception as e:  # noqa: BLE001 — fall back to unpacked
            _log(f"[bench] packed-pq mode unavailable: {e!r}")
    elif packed_env != "0":
        bits = int(packed_env) if packed_env in ("4", "8") else 8
        est = idx.ntotal * idx.config.m0 * (d * bits // 8 + 4)
        budget = min(10 * 10**9,
                     max(0, (env.get("free_hbm_GB", 15) - 4)) * 10**9)
        if packed_env in ("4", "8") or est <= budget:
            t0 = time.time()
            try:
                nb = idx.enable_packed(bits=bits)
                packed_bits = bits
                packed_mode = f"sq{bits}"
                _log(f"[bench] packed tables: {nb/1e9:.2f} GB "
                     f"({bits}-bit) in {time.time()-t0:.1f}s")
            except Exception as e:  # noqa: BLE001 — fall back to unpacked
                _log(f"[bench] packed mode unavailable: {e!r}")

    # ---- packed-mode canary (VERDICT.md r2 item 2c): the round-2 artifact
    # recorded recall 0.015 across a whole sweep because a broken packed
    # path was silently trusted. Before any timed sweep, compare packed vs
    # unpacked recall on a small spot-check; a divergence disables packing
    # and flags the artifact — a broken serving mode must never set the
    # operating point.
    canary = None
    if packed_bits:
        nc = min(len(queries), 1024)
        qc = jnp.asarray(np.asarray(queries[:nc], np.float32))
        _, ic_p = idx.search(qc, k=10, ef_search=64, use_packed=True)
        _, ic_u = idx.search(qc, k=10, ef_search=64, use_packed=False)
        r_p = recall_at_k(np.asarray(ic_p), gt[:nc], 10)
        r_u = recall_at_k(np.asarray(ic_u), gt[:nc], 10)
        canary = {"packed_recall": round(r_p, 4),
                  "unpacked_recall": round(r_u, 4), "n_queries": nc}
        if r_p < r_u - 0.05:
            canary["verdict"] = "FAILED — packed disabled"
            _log(f"[bench] PACKED CANARY FAILED: packed recall {r_p:.4f} "
                 f"vs unpacked {r_u:.4f} at ef=64 — disabling packed mode")
            idx.disable_packed()
            packed_bits = 0
            packed_mode = None
        else:
            canary["verdict"] = "ok"
            _log(f"[bench] packed canary ok: packed {r_p:.4f} / "
                 f"unpacked {r_u:.4f} at ef=64")

    # ---- efSearch sweep: find the cheapest ef reaching the target recall.
    # Queries staged on device once; results stay on device during timing
    # (the tunneled D2H of a [8192, 10] result would dominate honest timing);
    # ids are fetched ONCE per point for recall, outside the timed reps.
    queries_dev = jnp.asarray(np.asarray(queries, np.float32))

    class _PackedFellBack(Exception):
        pass

    # BENCH_SWEEP=fast (default): stop as soon as the target-recall point is
    # found — the full recall/qps frontier (BENCH_SWEEP=full) is informative
    # but costs minutes of compile+timing the driver budget doesn't have
    # (VERDICT.md r3 Weak #1); benchmarks/run_all.py publishes frontiers.
    sweep_mode = os.environ.get("BENCH_SWEEP", "fast")

    def run_sweep():
        results = []
        chosen = None
        for ef in (16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512):
            try:
                dd, ii = idx.search(queries_dev, k=10, ef_search=ef,
                                    device_out=True)  # compile+warm
                _sync_fetch(ii)
            except Exception as e:  # noqa: BLE001
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                # shared-tunnel co-tenant claimed HBM since the probe: drop
                # the packed tables (if any) and RESTART the sweep unpacked
                # (a mixed packed/unpacked sweep under one packed_bits label
                # would lie about what was measured), else back off — tenant
                # bursts pass
                if idx.packed_enabled:
                    raise _PackedFellBack() from e
                for attempt in range(4):
                    time.sleep(15 * (attempt + 1))
                    try:
                        dd, ii = idx.search(queries_dev, k=10, ef_search=ef,
                                            device_out=True)
                        _sync_fetch(ii)
                        break
                    except Exception as e2:  # noqa: BLE001
                        if ("RESOURCE_EXHAUSTED" not in str(e2)
                                or attempt == 3):
                            raise
                        _log(f"[bench] still exhausted (attempt {attempt+1})"
                             " — backing off")
            times = []
            for _ in range(max(reps, 1)):
                t0 = time.time()
                dd, ii = idx.search(queries_dev, k=10, ef_search=ef,
                                    device_out=True)
                _sync_fetch(ii)
                times.append(time.time() - t0)
            dt = min(times)
            r = recall_at_k(np.asarray(ii), gt, 10)
            qps = len(queries) / dt
            results.append({"ef": ef, "recall@10": round(r, 4),
                            "qps": round(qps, 1),
                            "reps_ms": [round(t * 1e3, 1) for t in times]})
            _log(f"[bench] ef={ef:4d} recall@10={r:.4f} qps={qps:,.0f} "
                 f"(best of {len(times)})")
            if r >= target_recall and chosen is None:
                chosen = results[-1]
                if sweep_mode == "fast":
                    break
            if r >= max(0.999, target_recall):
                break
        return results, chosen

    try:
        results, chosen = run_sweep()
    except _PackedFellBack:
        _log("[bench] RESOURCE_EXHAUSTED with packed tables — dropping them "
             "and RESTARTING the sweep unpacked")
        idx.disable_packed()
        packed_bits = 0
        packed_mode = None
        results, chosen = run_sweep()

    # ---- operating-point refinement: both ef and the hop cap are runtime
    # scalars, and the coarse sweep leaves ~5-10% on the table (measured at
    # 1M: ef=64/auto 19.6k qps -> ef=60/hops=61 21.4k at recall 0.954).
    # Tune on the DISJOINT probe split (VERDICT.md r3 item 8), then TIME the
    # refined point and keep it only if it still reaches the target on the
    # full reported query set and is actually faster. BENCH_REFINE=0
    # disables.
    refined = None
    if chosen is not None and os.environ.get("BENCH_REFINE", "1") != "0":
        try:
            probe_dev = jnp.asarray(np.asarray(probe_queries, np.float32))
            ef_r, hops_r = idx.tune_operating_point(
                probe_dev, target_recall, k=10, set_default=False,
                ef_grid=tuple(e for e in (16, 24, 32, 40, 48, 56, 64, 80,
                                          96, 128, 192, 256, 384, 512)
                              if e <= chosen["ef"] + 16))
            dd, ii = idx.search(queries_dev, k=10, ef_search=ef_r,
                                max_hops=hops_r, device_out=True)
            _sync_fetch(ii)
            times = []
            for _ in range(max(reps, 1)):
                t0 = time.time()
                dd, ii = idx.search(queries_dev, k=10, ef_search=ef_r,
                                    max_hops=hops_r, device_out=True)
                _sync_fetch(ii)
                times.append(time.time() - t0)
            r = recall_at_k(np.asarray(ii), gt, 10)
            qps = len(queries) / min(times)
            refined = {"ef": ef_r, "max_hops": hops_r,
                       "recall@10": round(r, 4), "qps": round(qps, 1)}
            _log(f"[bench] refined op point: ef={ef_r} hops={hops_r} "
                 f"recall@10={r:.4f} qps={qps:,.0f}")
            if r >= target_recall and qps > chosen["qps"]:
                chosen = dict(refined)
        except Exception as e:  # noqa: BLE001 — refinement is best-effort
            _log(f"[bench] refinement failed: {e!r}")

    # Fail-honest operating point (VERDICT.md r2 Weak #2): when no sweep
    # point reaches the target recall, the artifact must say so — value 0
    # and a metric string carrying the best recall actually achieved, never
    # a passing-shaped number.
    target_reached = chosen is not None
    if not target_reached:
        chosen = max(results, key=lambda p: p["recall@10"])
        _log(f"[bench] TARGET RECALL {target_recall} NOT REACHED — best "
             f"point: recall {chosen['recall@10']} at ef={chosen['ef']} "
             f"({chosen['qps']} qps). Reporting value=0.")

    # ---- stream throughput at the op point (VERDICT.md r4 item 2): the
    # single-batch wall above charges the FULL per-dispatch host<->device
    # sync (~26 ms on this tunneled chip, sub-ms on a local host) to every
    # batch. A serving system keeps the dispatch queue non-empty, so the
    # honest throughput number pipelines BENCH_PIPELINE dispatches
    # back-to-back and syncs once (execution is stream-ordered: syncing the
    # last result fences them all). Measured marginal cost per queued
    # dispatch: ~3 ms (scripts/pipeline_probe.py) — the sync amortizes
    # almost perfectly. BENCH_PIPELINE=0/1 disables (headline = batch wall).
    pipeline_depth = int(os.environ.get("BENCH_PIPELINE", 8))
    qps_stream = None
    if target_reached and pipeline_depth > 1:
        kw_op = {"ef_search": chosen["ef"], "device_out": True}
        if chosen.get("max_hops"):
            kw_op["max_hops"] = chosen["max_hops"]
        dd, ii = idx.search(queries_dev, k=10, **kw_op)  # warm
        _sync_fetch(ii)
        s_times = []
        for _ in range(max(reps, 1)):
            t0 = time.time()
            for _ in range(pipeline_depth):
                dd, ii = idx.search(queries_dev, k=10, **kw_op)
            _sync_fetch(ii)
            s_times.append(time.time() - t0)
        qps_stream = pipeline_depth * len(queries) / min(s_times)
        _log(f"[bench] stream qps (depth={pipeline_depth}, one sync): "
             f"{qps_stream:,.0f} vs batch-wall {chosen['qps']:,.0f} "
             f"(sync amortized: "
             f"{min(s_times)/pipeline_depth*1e3:.1f} ms/batch vs "
             f"{len(queries)/chosen['qps']*1e3:.1f} ms)")

    # ---- hnsw_stats at the operating point (ndis/hops, faiss parity)
    stats = HnswStats()
    t0 = time.time()
    _, ii, st = idx.search(queries_dev, k=10, ef_search=chosen["ef"],
                           max_hops=chosen.get("max_hops", 0),
                           with_stats=True)
    stats.accumulate(len(queries), st, wall=time.time() - t0)
    stat_summary = stats.summary()
    _log(f"[bench] stats@op: ndis/query={stat_summary['ndis_per_query']:.0f} "
         f"hops/batch={stat_summary['hops_per_batch']:.0f}")

    # ---- CPU single-core baseline: CACHED (VERDICT.md r3 item 1a — the
    # workload is seeded and deterministic, and the from-scratch serial 1M
    # build costs ~16 min, which is what timed out BENCH_r03). On a cache
    # hit the ratio is real; on a miss the summary prints vs_baseline=null
    # IMMEDIATELY and the baseline is computed + cached afterwards so the
    # next run has it.
    nq_cap = min(len(queries), 1000)
    cpu_n = min(len(base), int(os.environ.get("BENCH_CPU_N", len(base))))
    cache_key = (f"{wl.name}|M={m}|efC={efc}|target={target_recall}"
                 f"|nq={nq_cap}|cpu_n={cpu_n}")
    base_qps, base_src = _baseline_cache_get(cache_key)
    baseline_cached = base_src is not None
    if baseline_cached:
        _log(f"[bench] cpu baseline (cached): {base_qps} qps "
             f"[{base_src}] key={cache_key}")
    # headline = stream throughput when measured (and faster); single-batch
    # wall is always in the detail line as qps_batch_wall
    head_qps = chosen["qps"]
    if qps_stream is not None and qps_stream > head_qps:
        head_qps = round(qps_stream, 1)
    vs = (head_qps / base_qps) if (base_qps and target_reached) else None

    metric_s = (f"qps/chip @ recall@10>={target_recall} "
                f"({wl.name}, M={m}, efC={efc})")
    if not target_reached:
        metric_s += (f" — TARGET NOT REACHED (best recall "
                     f"{chosen['recall@10']} at ef={chosen['ef']})")
    out = {
        "metric": metric_s,
        "value": head_qps if target_reached else 0.0,
        "unit": "qps",
        "vs_baseline": round(vs, 3) if vs else None,
    }
    # THE machine-parseable line — printed before any post-flight work so a
    # driver timeout can no longer eat it (BENCH_r03 died rc=124 with the
    # summary still unprinted).
    print(json.dumps(out), flush=True)

    # ---- post-summary work: diagnostics + cache fills (best-effort — a
    # timeout here costs nothing that gates the artifact)
    if check_mode == "post":
        check_summary = run_invariant_check()
    if not baseline_cached and os.environ.get("BENCH_BASELINE", "1") != "0":
        base_qps, base_src = _cpu_baseline_qps(base, queries, gt, wl.metric,
                                               m, efc, target_recall)
        if base_src != "none":
            _baseline_cache_put(cache_key, base_qps, base_src)
        if base_qps and target_reached:
            vs = head_qps / base_qps
            _log(f"[bench] vs_baseline (freshly measured, cached for next "
                 f"run): {vs:.3f}")
    extra = {
        "target_reached": target_reached,
        "recall_at_op": chosen["recall@10"], "ef_at_op": chosen["ef"],
        "max_hops_at_op": chosen.get("max_hops", 0), "refined": refined,
        "qps_batch_wall": chosen["qps"],
        "qps_stream": round(qps_stream, 1) if qps_stream else None,
        "pipeline_depth": pipeline_depth,
        "probe_disjoint": probe_disjoint,
        "build_seconds": round(build_s, 1),
        "build_inserts_per_s": round(n / build_s, 1),
        "timing": (f"best-of-{reps}, device-resident results, fetch-synced; "
                   f"headline streams depth-{pipeline_depth} dispatches per "
                   f"sync when that is faster"),
        "environment": env, "downsized": downsized,
        "ndis_per_query": round(stat_summary["ndis_per_query"], 1),
        "hops_per_batch": round(stat_summary["hops_per_batch"], 1),
        "packed_bits": packed_bits, "packed_mode": packed_mode,
        "packed_canary": canary,
        "invariant_check": check_summary,
        "backlink_window_drops": bl_dropped,
        "sweep": results, "sweep_mode": sweep_mode,
        "baseline_qps": base_qps, "baseline_source": base_src,
        "baseline_cached": baseline_cached,
        "vs_baseline_final": round(vs, 3) if vs else None,
        "n": n, "d": d, "batch": len(queries), "dtype": dtype,
        "beam_keys": idx.beam_keys,
    }
    _log("[bench] detail: " + json.dumps(extra))


_BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "data", "baseline_cache.json")


def _baseline_cache_get(key: str):
    """(qps, source) for a cached CPU-baseline measurement, else (None,
    None). The cache is committed alongside the repo: the baseline engine
    is single-core deterministic C++ on a seeded workload, so the number is
    machine-class-stable — and re-deriving it every run is what blew the
    round-3 driver budget (BENCH_r03 rc=124)."""
    try:
        with open(_BASELINE_CACHE) as f:
            ent = json.load(f).get(key)
        if ent:
            return ent["qps"], ent["source"] + "(cached)"
    except Exception:  # noqa: BLE001 — absent/corrupt cache = miss
        pass
    return None, None


_LAST_BASELINE_META: dict = {}  # provenance from the most recent
# _cpu_baseline_qps run (host, date, reps, per-rep qps) — VERDICT r4 item
# 7: the denominator was single-shot on a contended box; entries now carry
# enough context to judge their error bar.


def _baseline_cache_put(key: str, qps, source: str) -> None:
    if not qps:  # never cache a failed measurement (it would pin the
        return   # failure across runs; recomputing is the safe default)
    try:
        data = {}
        try:
            with open(_BASELINE_CACHE) as f:
                data = json.load(f)
        except Exception:  # noqa: BLE001
            pass
        data[key] = {"qps": qps, "source": source, **_LAST_BASELINE_META}
        os.makedirs(os.path.dirname(_BASELINE_CACHE), exist_ok=True)
        with open(_BASELINE_CACHE, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        _log(f"[bench] baseline cached: {key} -> {qps} qps [{source}]")
    except Exception as e:  # noqa: BLE001
        _log(f"[bench] baseline cache write failed: {e!r}")


def _subset_gt(b, q, metric, k=10, tile=131072):
    """Exact top-k of q against b on the HOST, dot-product formulation
    (never materializes [nq, n, d] — the naive broadcast at 1M x 960 is
    245 GB). Used for capped CPU baselines; nq <= 1000 so cost is one
    [nq, n] matmul in tiles."""
    q = np.asarray(q, np.float32)
    b = np.asarray(b, np.float32)
    scores = np.empty((len(q), len(b)), np.float32)
    for s in range(0, len(b), tile):
        blk = b[s:s + tile]
        dots = q @ blk.T
        if metric == "ip":
            scores[:, s:s + len(blk)] = -dots
        else:
            scores[:, s:s + len(blk)] = (blk * blk).sum(1)[None, :] - 2 * dots
    return np.argsort(scores, axis=1, kind="stable")[:, :k].astype(np.int64)


def _cpu_baseline_qps(base, queries, gt, metric, m, efc, target_recall):
    """Single-core CPU HNSW QPS at the target recall on the same workload.
    Uses the bundled C++ engine; falls back to faiss; else None."""
    from hnsw_tpu.utils.recall import recall_at_k
    nq_cap = min(len(queries), 1000)  # CPU sweep cost control
    q = queries[:nq_cap]
    # gt may be None when the caller knows the baseline is capped (the
    # subset GT below replaces it); uncapped runs require it
    g = None if gt is None else gt[:nq_cap]
    try:
        from hnsw_tpu.native import cpu_baseline  # bundled C++ engine
        eng = cpu_baseline.CpuHnsw(base.shape[1], m, metric)
        n_build = min(len(base), int(os.environ.get("BENCH_CPU_N",
                                                    len(base))))
        if n_build < len(base):
            # capped baseline (BENCH_CPU_N): the denominator index holds
            # only base[:n_build], so its recall must be measured against
            # the SUBSET ground truth — the full-set GT caps recall at
            # ~n_build/len(base) no matter how well it searches (the
            # round-4 deep10m@1M-cap run measured exactly 0.1008). A
            # smaller index is also faster to search, so the published
            # multiple is conservative.
            t0 = time.time()
            g = _subset_gt(base[:n_build], q, metric)
            _log(f"[bench] capped baseline: subset GT over base[:{n_build}]"
                 f" ({time.time()-t0:.1f}s)")
        elif g is None:
            raise ValueError("uncapped CPU baseline needs ground truth")
        t0 = time.time()
        eng.add(base[:n_build], ef_construction=efc)
        _log(f"[bench] cpu baseline build ({n_build} pts, 1 core): "
             f"{time.time()-t0:.1f}s")
        best_r = 0.0
        for ef in (16, 32, 64, 128, 256, 512):
            t0 = time.time()
            ii = eng.search(q, 10, ef_search=ef)
            dt = time.time() - t0
            r = recall_at_k(ii, g, 10)
            best_r = max(best_r, r)
            qps = nq_cap / dt
            _log(f"[bench] cpu ef={ef} recall={r:.4f} qps={qps:,.0f}")
            if r >= target_recall:
                # median-of-reps at the crossing ef (recall is
                # deterministic for a built engine, only the timing is
                # noisy on a shared host — VERDICT r4 item 7). Record
                # provenance so the cache entry's error bar is auditable.
                reps = max(1, int(os.environ.get("BENCH_CPU_REPS", 3)))
                qps_reps = [qps]
                for _ in range(reps - 1):
                    t0 = time.time()
                    eng.search(q, 10, ef_search=ef)
                    qps_reps.append(nq_cap / (time.time() - t0))
                med = float(np.median(qps_reps))
                _LAST_BASELINE_META.update(
                    host=platform.node(), date=time.strftime("%Y-%m-%d"),
                    reps=reps, ef=ef, recall=round(float(r), 4),
                    qps_reps=[round(x, 1) for x in qps_reps])
                _log(f"[bench] cpu baseline median-of-{reps} at ef={ef}: "
                     f"{med:,.1f} qps (reps {qps_reps})")
                return round(med, 1), "bundled-cpp-single-core"
        # VERDICT.md r2 Weak #3: a baseline that never reaches the target
        # recall is NOT a valid denominator (a 0-point index "searches" at
        # 15M qps) — report failure instead of a nonsense ratio.
        _log(f"[bench] cpu baseline NEVER reached target recall "
             f"{target_recall} (best {best_r:.4f}) — no vs_baseline")
        return None, f"bundled-cpp-single-core(target-not-reached " \
                     f"best={best_r:.4f})"
    except Exception as e:  # noqa: BLE001
        _log(f"[bench] bundled cpu baseline unavailable: {e!r}")
    try:
        import faiss  # type: ignore
        fmetric = (faiss.METRIC_INNER_PRODUCT if metric == "ip"
                   else faiss.METRIC_L2)
        fidx = faiss.IndexHNSWFlat(base.shape[1], m, fmetric)
        fidx.hnsw.efConstruction = efc
        faiss.omp_set_num_threads(1)
        fidx.add(base)
        best_r = 0.0
        for ef in (16, 32, 64, 128, 256, 512):
            fidx.hnsw.efSearch = ef
            t0 = time.time()
            _, ii = fidx.search(q, 10)
            dt = time.time() - t0
            r = recall_at_k(ii, g, 10)
            best_r = max(best_r, r)
            if r >= target_recall:
                return round(nq_cap / dt, 1), "faiss-cpu-single-core"
        return None, f"faiss-cpu-single-core(target-not-reached " \
                     f"best={best_r:.4f})"
    except Exception as e:  # noqa: BLE001
        _log(f"[bench] faiss unavailable: {e!r}")
    return None, "none"


if __name__ == "__main__":
    main()
