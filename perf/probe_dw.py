"""Weight-gradient matmul isolation: dW = x^T @ dy at training shapes."""
import time
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
B, T = 16, 1500
x = jnp.asarray(rng.standard_normal((B, T, 1024)), jnp.bfloat16)
dy = jnp.asarray(rng.standard_normal((B, T, 4096)), jnp.bfloat16)

def bench(name, fn, *args, flops=0):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    _ = float(f(*args))
    t0 = time.perf_counter(); N = 20
    for _ in range(N): out = f(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:44s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)

FL = 2 * B * T * 1024 * 4096
bench("dW einsum btd,bte->de f32", lambda x, dy: jnp.einsum('btd,bte->de', x, dy, preferred_element_type=jnp.float32), x, dy, flops=FL)
bench("dW reshaped 2d dot f32", lambda x, dy: jax.lax.dot_general(x.reshape(-1,1024), dy.reshape(-1,4096), (((0,),(0,)),((),())), preferred_element_type=jnp.float32), x, dy, flops=FL)
# fwd-style matmul for comparison
w = jnp.asarray(rng.standard_normal((1024, 4096)), jnp.bfloat16)
bench("fwd x@W", lambda x, w: x.reshape(-1,1024) @ w, x, w, flops=FL)
# dW written into a stacked f32 buffer via dynamic_update_slice (the scan-carry pattern)
buf = jnp.zeros((24, 1024, 4096), jnp.float32)
def dw_dus(buf, x, dy):
    dw = jax.lax.dot_general(x.reshape(-1,1024), dy.reshape(-1,4096), (((0,),(0,)),((),())), preferred_element_type=jnp.float32)
    return jax.lax.dynamic_update_slice(buf, dw[None], (3, 0, 0))
bench("dW + dus into (24,1024,4096) f32", dw_dus, buf, x, dy, flops=FL)
# barrier between the matmul and the DUS: XLA must materialize dW at full
# matmul efficiency and the DUS degenerates to a plain slice write
def dw_dus_barrier(buf, x, dy):
    dw = jax.lax.dot_general(x.reshape(-1,1024), dy.reshape(-1,4096), (((0,),(0,)),((),())), preferred_element_type=jnp.float32)
    dw = jax.lax.optimization_barrier(dw)
    return jax.lax.dynamic_update_slice(buf, dw[None], (3, 0, 0))
bench("dW + barrier + dus f32", dw_dus_barrier, buf, x, dy, flops=FL)
# bf16 stacked-grad buffer halves the DUS write traffic
buf16 = jnp.zeros((24, 1024, 4096), jnp.bfloat16)
def dw_dus_bf16(buf, x, dy):
    dw = jax.lax.dot_general(x.reshape(-1,1024), dy.reshape(-1,4096), (((0,),(0,)),((),())), preferred_element_type=jnp.float32)
    return jax.lax.dynamic_update_slice(buf, dw[None].astype(jnp.bfloat16), (3, 0, 0))
bench("dW + dus bf16 buffer", dw_dus_bf16, buf16, x, dy, flops=FL)
def dw_dus_bf16_barrier(buf, x, dy):
    dw = jax.lax.dot_general(x.reshape(-1,1024), dy.reshape(-1,4096), (((0,),(0,)),((),())), preferred_element_type=jnp.float32)
    dw = jax.lax.optimization_barrier(dw.astype(jnp.bfloat16))
    return jax.lax.dynamic_update_slice(buf, dw[None], (3, 0, 0))
bench("dW + barrier + dus bf16 buffer", dw_dus_bf16_barrier, buf16, x, dy, flops=FL)
