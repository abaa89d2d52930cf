"""Direct TPU probe of cross_block_decode: full traceback + micro timing.

Run standalone (serialize with other TPU jobs): python perf/probe_cross.py
"""

import os
import time

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import olmoasr_tpu.cache_config  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from olmoasr_tpu.ops.attention import cross_block_decode

L, B, T, D, H = 12, 32, 1500, 768, 12
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, 1, D)), jnp.bfloat16)
ln_g = jnp.ones((L, D), jnp.bfloat16)
ln_b = jnp.zeros((L, D), jnp.bfloat16)
wq = jnp.asarray(rng.standard_normal((L, D, D)) * 0.02, jnp.bfloat16)
bq = jnp.zeros((L, D), jnp.bfloat16)
wo = jnp.asarray(rng.standard_normal((L, D, D)) * 0.02, jnp.bfloat16)
bo = jnp.zeros((L, D), jnp.bfloat16)
ck = jnp.asarray(rng.integers(-127, 127, (L, B, T, D)), jnp.int8)
cv = jnp.asarray(rng.integers(-127, 127, (L, B, T, D)), jnp.int8)
cks = jnp.asarray(rng.random((L, B, T)) * 0.02 + 0.001, jnp.float32)
cvs = jnp.asarray(rng.random((L, B, T)) * 0.02 + 0.001, jnp.float32)

print("devices:", jax.devices())


@jax.jit
def run_all_layers(x):
    def body(x, li):
        return (
            cross_block_decode(
                x, ln_g, ln_b, wq, bq, wo, bo, ck, cv, cks, cvs, li, n_head=H
            ),
            None,
        )

    x, _ = jax.lax.scan(body, x, jnp.arange(L, dtype=jnp.int32))
    return x


t0 = time.perf_counter()
out = run_all_layers(x)
_ = np.asarray(out[:, 0, :8])
print(f"compile+run: {time.perf_counter() - t0:.1f}s")

iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    out = run_all_layers(out)
_ = np.asarray(out[:, 0, :8])
dt = (time.perf_counter() - t0) / iters
kv_bytes = 2 * L * B * T * D
print(
    f"12-layer cross block: {dt * 1e3:.3f} ms/step  "
    f"({kv_bytes / dt / 1e9:.0f} GB/s effective on {kv_bytes / 1e6:.0f} MB int8)"
)
