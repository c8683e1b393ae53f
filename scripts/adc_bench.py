"""Microbenchmark: the per-hop ops of PQ routing, timed honestly on the
tunneled axon TPU (async dispatch: wall-clock inflates or deflates unless
the work is iterated INSIDE one jitted fori_loop with a data-dependent
carry, then synced with a 1-element D2H fetch — see .claude/skills/verify).

Measures, per hop-shaped call (Q queries x K candidates):
  flat_gather   [N,128] f32 row gather + distance einsum (the flat path)
  sq8_gather    [N,128] u8 row gather + dequant einsum (the sq8 path)
  pq_gather     [N,m] u8 code-row gather alone
  adc_lut       take_along_axis LUT lookup alone (codes resident)
  pq_full       code gather + ADC (the PQ routing path as shipped)

Run:  python scripts/adc_bench.py [Q] [K] [m] [ksub]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

Q = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
M = int(sys.argv[3]) if len(sys.argv) > 3 else 16
KSUB = int(sys.argv[4]) if len(sys.argv) > 4 else 256
D = 128
N = 1_000_000
ITERS = 32

print(f"device={jax.devices()[0].platform} Q={Q} K={K} m={M} ksub={KSUB} "
      f"N={N} iters={ITERS}")

rng = np.random.default_rng(0)
lut = jnp.asarray(rng.standard_normal((Q, M, KSUB), dtype=np.float32))
codes_tab = jnp.asarray(rng.integers(0, KSUB, (N, M)).astype(np.uint8))
vecs_f32 = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
vecs_u8 = jnp.asarray(rng.integers(0, 256, (N, D)).astype(np.uint8))
ids = jnp.asarray(rng.integers(0, N, (Q, K)).astype(np.int32))
codes_res = jnp.asarray(rng.integers(0, KSUB, (Q, K, M)).astype(np.uint8))
qv = jnp.asarray(rng.standard_normal((Q, D), dtype=np.float32))
off = jnp.asarray(rng.standard_normal((D,), dtype=np.float32))
sc = jnp.abs(jnp.asarray(rng.standard_normal((D,), dtype=np.float32)))


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def bench(name, step, *arrays):
    """step(carry_i32, *arrays) -> f32 scalar; iterated in-device. Arrays
    are jit ARGUMENTS (closing over them would embed them as constants in
    the remote-compile request — HTTP 413 at 512 MB)."""

    @jax.jit
    def run(c0, *arrs):
        def body(i, c):
            return c + step(i + c.astype(jnp.int32), *arrs)
        return jax.lax.fori_loop(0, ITERS, body,
                                 c0.astype(jnp.float32))

    out = run(jnp.int32(1), *arrays)
    sync(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(jnp.int32(1), *arrays))
        ts.append(time.perf_counter() - t0)
    ms = np.median(ts) / ITERS * 1e3
    print(f"{name:14s} {ms:8.3f} ms/hop   "
          f"({Q * K / (ms * 1e-3) / 1e6:7.1f}M cand/s)")


def perturb(c, ids_):
    return (ids_ + c) % N


def dist_step(v, qv_):
    dots = jnp.einsum("qd,qkd->qk", qv_, v,
                      preferred_element_type=jnp.float32)
    sq = jnp.einsum("qkd,qkd->qk", v, v, preferred_element_type=jnp.float32)
    return jnp.sum((sq - 2 * dots)[:, :1])


def flat_gather(c, vecs, ids_, qv_):
    return dist_step(vecs[perturb(c, ids_)], qv_)


def sq8_gather(c, vecs, ids_, qv_, off_, sc_):
    v = off_ + sc_ * vecs[perturb(c, ids_)].astype(jnp.float32)
    return dist_step(v, qv_)


def pq_gather(c, tab, ids_):
    rows = tab[perturb(c, ids_)]
    return jnp.sum(rows[:, :1, :1].astype(jnp.float32))


def adc(lut_, codes_):
    idx = jnp.swapaxes(codes_.astype(jnp.int32), -1, -2)
    vals = jnp.take_along_axis(lut_, idx, axis=-1)
    return jnp.sum(vals, axis=-2)


def adc_lut(c, lut_, codes_):
    cc = (codes_.astype(jnp.int32) + c) % KSUB
    return jnp.sum(adc(lut_, cc)[:, :1])


def pq_full(c, tab, ids_, lut_):
    rows = tab[perturb(c, ids_)]
    return jnp.sum(adc(lut_, rows)[:, :1])


bench("flat_gather", flat_gather, vecs_f32, ids, qv)
bench("sq8_gather", sq8_gather, vecs_u8, ids, qv, off, sc)
bench("pq_gather", pq_gather, codes_tab, ids)
bench("adc_lut", adc_lut, lut, codes_res)
bench("pq_full", pq_full, codes_tab, ids, lut)
