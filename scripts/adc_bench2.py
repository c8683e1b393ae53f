"""ADC formulation shootout (honest in-loop timing, see adc_bench.py).

D[q,k] = sum_m lut[q, m, codes[q,k,m]],  lut [Q,m,ksub], codes [Q,K,m].

  taa      take_along_axis (shipped impl)   — measured 166 ms/hop at 256
  wsum     compare+where+sum fusion (VPU)
  onehot   one_hot bf16 + batched-matvec einsum (MXU)
  onehotf  one_hot f32 variant
  decode   one-hot matmul decode to x-hat + flat-style distance einsum

Accuracy is checked on a small query slice (a full-shape eager one-hot is
8.6 GB — OOM).

Run: python scripts/adc_bench2.py [Q] [K] [m] [ksub]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

Q = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
M = int(sys.argv[3]) if len(sys.argv) > 3 else 16
KSUB = int(sys.argv[4]) if len(sys.argv) > 4 else 256
DSUB = max(1, 128 // M)   # d=128 equivalent
ITERS = 16

print(f"device={jax.devices()[0].platform} Q={Q} K={K} m={M} ksub={KSUB}",
      flush=True)

rng = np.random.default_rng(0)
lut = jnp.asarray(rng.standard_normal((Q, M, KSUB), dtype=np.float32))
codes = jnp.asarray(rng.integers(0, KSUB, (Q, K, M)).astype(np.uint8))
cb = jnp.asarray(rng.standard_normal((M, KSUB, DSUB), dtype=np.float32))
qv = jnp.asarray(rng.standard_normal((Q, M * DSUB), dtype=np.float32))


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def pert(c, codes_):
    return (codes_.astype(jnp.int32) + c) % KSUB


def taa_fn(lut_, cc):
    idx = jnp.swapaxes(cc, -1, -2)
    return jnp.sum(jnp.take_along_axis(lut_, idx, axis=-1), axis=-2)


def taa(c, lut_, codes_):
    return taa_fn(lut_, pert(c, codes_))


def wsum(c, lut_, codes_):
    cc = pert(c, codes_)[..., None]                     # [Q,K,m,1]
    iota = jnp.arange(KSUB, dtype=jnp.int32)
    return jnp.sum(jnp.where(cc == iota, lut_[:, None], 0.0), axis=(-1, -2))


def onehot(c, lut_, codes_):
    q = lut_.shape[0]
    oh = jax.nn.one_hot(pert(c, codes_), KSUB, dtype=jnp.bfloat16)
    oh = oh.reshape(q, K, M * KSUB)
    return jnp.einsum("qkc,qc->qk", oh,
                      lut_.reshape(q, M * KSUB).astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def onehotf(c, lut_, codes_):
    q = lut_.shape[0]
    oh = jax.nn.one_hot(pert(c, codes_), KSUB, dtype=jnp.float32)
    oh = oh.reshape(q, K, M * KSUB)
    return jnp.einsum("qkc,qc->qk", oh, lut_.reshape(q, M * KSUB),
                      preferred_element_type=jnp.float32)


def decode(c, cb_, codes_, qv_, dt=jnp.bfloat16):
    q = codes_.shape[0]
    oh = jax.nn.one_hot(pert(c, codes_), KSUB, dtype=dt)
    xh = jnp.einsum("qkmc,mcd->qkmd", oh, cb_.astype(dt),
                    preferred_element_type=jnp.float32)
    xh = xh.reshape(q, K, M * DSUB)
    dots = jnp.einsum("qd,qkd->qk", qv_, xh,
                      preferred_element_type=jnp.float32)
    sq = jnp.einsum("qkd,qkd->qk", xh, xh,
                    preferred_element_type=jnp.float32)
    return sq - 2 * dots


def decodef(c, cb_, codes_, qv_):
    return decode(c, cb_, codes_, qv_, dt=jnp.float32)


def bench(name, step, *arrays, check=True):
    @jax.jit
    def run(c0, *arrs):
        def body(i, c):
            out = step(i + c.astype(jnp.int32), *arrs)
            return c + jnp.sum(out[:, :1])
        return jax.lax.fori_loop(0, ITERS, body, c0.astype(jnp.float32))

    try:
        sync(run(jnp.int32(1), *arrays))
    except Exception as e:  # noqa: BLE001
        print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:100]}",
              flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(jnp.int32(1), *arrays))
        ts.append(time.perf_counter() - t0)
    ms = np.median(ts) / ITERS * 1e3
    extra = ""
    if check:
        s = 256  # small slice: full-shape eager one-hot would OOM
        small = [a[:s] for a in arrays]
        got = jax.jit(step)(jnp.int32(0), *small)
        want = taa_fn(arrays[0][:s], pert(jnp.int32(0), arrays[1][:s]))
        err = float(jnp.max(jnp.abs(got - want)))
        extra = f"  max-err {err:.2e}"
    print(f"{name:10s} {ms:8.3f} ms/hop ({Q*K*M/(ms*1e-3)/1e9:6.2f}G "
          f"lookups/s){extra}", flush=True)


bench("taa", taa, lut, codes)
bench("wsum", wsum, lut, codes)
bench("onehot", onehot, lut, codes)
bench("onehotf", onehotf, lut, codes)
bench("decode", decode, cb, codes, qv, check=False)
bench("decodef", decodef, cb, codes, qv, check=False)
