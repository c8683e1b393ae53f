"""Does the axon tunnel's ~30ms per-dispatch overhead amortize when N
dispatches are queued before one sync? Uses a jitted matmul loop sized to
~tens of ms chip time (like a production search batch)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-l1")

x = jnp.asarray(np.random.default_rng(0).normal(size=(2048, 2048)),
                jnp.float32)


@jax.jit
def step(a, it):
    def body(i, m):
        return m @ m * 1e-3 + a * (1.0 + 1e-6 * i)
    return jax.lax.fori_loop(0, it, body, a)


for iters in (8, 32):
    # calibrate single-dispatch wall (includes sync)
    out = step(x, iters)
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    out = step(x, iters)
    np.asarray(out.ravel()[:1])
    single = time.perf_counter() - t0

    for depth in (1, 2, 4, 8, 16):
        t0 = time.perf_counter()
        outs = [step(x, iters) for _ in range(depth)]
        np.asarray(outs[-1].ravel()[:1])
        wall = time.perf_counter() - t0
        print(f"iters={iters:3d} single={single*1e3:7.1f}ms depth={depth:2d} "
              f"wall={wall*1e3:8.1f}ms per-dispatch={wall/depth*1e3:7.1f}ms",
              flush=True)
