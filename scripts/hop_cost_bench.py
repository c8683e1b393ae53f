"""Per-hop cost decomposition of the level-0 beam at serving shape
(Q=8192, ef=64, K=64) — honest in-loop timing (see adc_bench.py), with the
tunnel's fixed per-call sync cost (~31 ms on the axon dev tunnel) measured
via an empty loop and SUBTRACTED. Earlier revisions of this script did not
subtract it, which made every per-op number read as ~(real + 31/ITERS) ms —
the round-3 "contraction cliff" analysis (ARCHITECTURE.md) started from
spotting that a scalar-only loop body "cost" the same as the merge sort.

Components:
  empty        scalar-only loop — the fixed-cost baseline
  sort_f32     lax.sort((f32 dist, i32 payload), num_keys=1) at [Q, 2*ef]
  sort_bf16    same with bf16 keys (routing keys tolerate bf16: packed
               mode reranks exactly at extraction)
  sort_1op     key-only sort (lower bound)
  member       buffer-membership dedup compare [Q, K, ef]
  argmin_sel   select nearest unexpanded + one-hot expanded-mark
  batched_matvec   the hop's distance contraction (the XLA cliff —
               ops/dist_kernel.py is the Pallas replacement)
  beam_kernel  the fused beam-update kernel (ops/beam_kernel.py)
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

Q = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
EF = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K = int(sys.argv[3]) if len(sys.argv) > 3 else 64
ITERS = int(os.environ.get("HOP_BENCH_ITERS", "32"))

print(f"device={jax.devices()[0].platform} Q={Q} ef={EF} K={K}", flush=True)
rng = np.random.default_rng(0)
dist2 = jnp.asarray(rng.standard_normal((Q, EF + K)).astype(np.float32))
pay2 = jnp.asarray(rng.integers(0, 1 << 21, (Q, EF + K)).astype(np.int32))
nbrs = jnp.asarray(rng.integers(0, 1 << 20, (Q, K)).astype(np.int32))
buf = jnp.asarray(rng.integers(0, 1 << 20, (Q, EF)).astype(np.int32))
bufd = jnp.asarray(rng.standard_normal((Q, EF)).astype(np.float32))
bufe = jnp.asarray((rng.random((Q, EF)) < 0.5))


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


FIXED = [0.0]


def bench(name, step, *arrays):
    @jax.jit
    def run(c0, *arrs):
        def body(i, c):
            return c + step(i + c.astype(jnp.int32), *arrs)
        return jax.lax.fori_loop(0, ITERS, body, c0.astype(jnp.float32))

    sync(run(jnp.int32(1), *arrays))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(jnp.int32(1), *arrays))
        ts.append(time.perf_counter() - t0)
    tot = np.median(ts)
    print(f"{name:16s} {tot*1e3:8.2f} ms total "
          f"{(tot - FIXED[0])/ITERS*1e3:8.3f} ms/op", flush=True)
    return tot


def sort_f32(c, d, p):
    sd, sp = jax.lax.sort((d + c.astype(jnp.float32) * 0.0 + 0.001 * c,
                           p), num_keys=1)
    return jnp.sum(sd[:, :1]) + jnp.sum(sp[:, :1]).astype(jnp.float32)


def sort_bf16(c, d, p):
    db = (d + 0.001 * c).astype(jnp.bfloat16)
    sd, sp = jax.lax.sort((db, p), num_keys=1)
    return jnp.sum(sd[:, :1].astype(jnp.float32)) + \
        jnp.sum(sp[:, :1]).astype(jnp.float32)


def sort_1op(c, d):
    sd = jax.lax.sort(d + 0.001 * c)
    return jnp.sum(sd[:, :1])


def member(c, nb, bf):
    nb2 = (nb + c) % (1 << 20)
    m = jnp.any(nb2[:, :, None] == bf[:, None, :], axis=2)
    return jnp.sum(m[:, :1]).astype(jnp.float32)


def argmin_sel(c, bd, be):
    key = jnp.where(be, jnp.inf, bd + 0.001 * c)
    j = jnp.argmin(key, axis=1)[:, None]
    sel = jnp.take_along_axis(key, j, axis=1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, EF, 1), 1)
    hit = jnp.any((slot == j[:, None, :]), axis=2)
    return jnp.sum(sel) + jnp.sum(hit[:, :1]).astype(jnp.float32)


FIXED[0] = bench("empty", lambda c: c.astype(jnp.float32) * 1e-6)
bench("sort_f32", sort_f32, dist2, pay2)
bench("sort_bf16", sort_bf16, dist2, pay2)
bench("sort_1op", sort_1op, dist2)
bench("member", member, nbrs, buf)
bench("argmin_sel", argmin_sel, bufd, bufe)


def batched_matvec(c, vecs, q):
    v = vecs + c.astype(jnp.float32) * 1e-9
    dots = jnp.einsum("qd,qkd->qk", q, v,
                      preferred_element_type=jnp.float32)
    return jnp.sum(dots[:, :1])


vecs = jnp.asarray(rng.standard_normal((Q, K, 128)).astype(np.float32))
qvec = jnp.asarray(rng.standard_normal((Q, 128)).astype(np.float32))
bench("batched_matvec", batched_matvec, vecs, qvec)


def pallas_matvec(c, vecs, q):
    from hnsw_tpu.ops.dist_kernel import gathered_vec_dist
    v = vecs + c.astype(jnp.float32) * 1e-9
    return jnp.sum(gathered_vec_dist(v, q, metric="l2")[:, :1])


def beam_kernel(c, bd, bi, nb, nd):
    from hnsw_tpu.ops.beam_kernel import beam_update
    od, op, cur, ndis = beam_update(
        bd + c.astype(jnp.float32) * 1e-9, bi, nb, nd, jnp.int32(EF),
        ef=EF)
    return jnp.sum(od[:1, :1]) + cur[0].astype(jnp.float32)


try:
    import sys as _s
    _s.path.insert(0, __file__.rsplit("/", 2)[0])
    bench("pallas_matvec", pallas_matvec, vecs, qvec)
    bp = jnp.asarray(((rng.integers(0, 1 << 20, (EF, Q)) << 1)
                      | rng.integers(0, 2, (EF, Q))).astype(np.int32))
    bd_t = jnp.asarray(np.sort(rng.standard_normal((EF, Q)), axis=0)
                       .astype(np.float32))
    nb_t = jnp.asarray(rng.integers(-1, 1 << 20, (K, Q)).astype(np.int32))
    nd_t = jnp.asarray(rng.standard_normal((K, Q)).astype(np.float32))
    bench("beam_kernel", beam_kernel, bd_t, bp, nb_t, nd_t)
except ImportError:
    print("hnsw_tpu not importable — skipping kernel rows", flush=True)
