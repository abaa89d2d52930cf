"""Micro-bench: beam self-ring reorder formulations on TPU.
ring (L, B*K, C, D) gathered by per-(window, beam) source rows."""
import time, sys
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax, jax.numpy as jnp

L, B, K, C, D = 12, 32, 5, 226, 768
rng = np.random.default_rng(0)
ring_k = jnp.asarray(rng.standard_normal((L, B*K, C, D)), jnp.bfloat16)
ring_v = jnp.asarray(rng.standard_normal((L, B*K, C, D)), jnp.bfloat16)
src = jnp.asarray(rng.integers(0, K, (B, K)), jnp.int32)  # per window

@jax.jit
def gather_rows(rk, rv, src):
    rows = (jnp.arange(B)[:, None] * K + src).reshape(-1)
    return jnp.take(rk, rows, axis=1), jnp.take(rv, rows, axis=1)

@jax.jit
def onehot_mm(rk, rv, src):
    P = jax.nn.one_hot(src, K, dtype=rk.dtype)  # (B, K, K)
    rk5 = rk.reshape(L, B, K, C, D)
    rv5 = rv.reshape(L, B, K, C, D)
    ok = jnp.einsum('bkj,lbjcd->lbkcd', P, rk5).reshape(L, B*K, C, D)
    ov = jnp.einsum('bkj,lbjcd->lbkcd', P, rv5).reshape(L, B*K, C, D)
    return ok, ov

def timeit(f, n=10):
    o = f(ring_k, ring_v, src); jax.block_until_ready(o)
    _ = float(jnp.asarray(o[0][0,0,0,0], jnp.float32))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(ring_k, ring_v, src)
    _ = float(jnp.asarray(o[0][0,0,0,0], jnp.float32))
    return (time.perf_counter() - t0) / n * 1e3

print("take-rows gather:", round(timeit(gather_rows), 3), "ms")
print("one-hot einsum  :", round(timeit(onehot_mm), 3), "ms")
