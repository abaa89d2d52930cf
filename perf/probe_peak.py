"""Peak achievable matmul throughput on this chip.

The MFU accounting (docs/TRAIN_PERF.md) divides by the v5e datasheet peak
(197e12 bf16). perf/r3_probe_dw1.log showed a large, aligned, bf16 matmul at
only ~76 TF/s — if the *achievable* ceiling on this chip/tunnel is materially
below datasheet, the ladder's MFU numbers are understated and the remaining
"headroom" is partly fictional. This probe measures the ceiling directly with
square matmuls large enough to amortize everything, plus the training-shaped
GEMMs, so each is quoted as %-of-datasheet AND %-of-measured-ceiling.
"""
import time
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
PEAK = 197e12


def bench(name, fn, *args, flops=0, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)).ravel()[0])  # force full sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    tfs = flops / dt / 1e12
    print(
        f"{name:40s} {dt*1e3:8.2f} ms  {tfs:6.1f} TF/s  {tfs/PEAK*1e14:5.1f}% of 197",
        flush=True,
    )
    return tfs


ceil = 0.0
for n in (4096, 8192):
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    tfs = bench(f"bf16 [{n}x{n}]@[{n}x{n}]", lambda a, b: a @ b, a, b, flops=2 * n**3)
    ceil = max(ceil, tfs)

# chained matmuls: amortize dispatch entirely (8 back-to-back GEMMs, one sync)
n = 4096
a = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
b = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)


def chain(a, b):
    x = a
    for _ in range(8):
        x = x @ b
    return x


tfs = bench("bf16 chained 8x [4096^2]", chain, a, b, flops=8 * 2 * n**3)
ceil = max(ceil, tfs)

# training-shaped GEMMs (medium.en encoder MLP / proj)
x = jnp.asarray(rng.standard_normal((16 * 1536, 1024)), jnp.bfloat16)
w1 = jnp.asarray(rng.standard_normal((1024, 4096)), jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.bfloat16)
bench("bf16 [24576,1024]@[1024,4096]", lambda x, w: x @ w, x, w1,
      flops=2 * 24576 * 1024 * 4096)
bench("bf16 [24576,1024]@[1024,1024]", lambda x, w: x @ w, x, w2,
      flops=2 * 24576 * 1024 * 1024)
# attention-shaped: D=64 contraction (the MXU K=64 half-occupancy question)
q = jnp.asarray(rng.standard_normal((256, 1536, 64)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((256, 1536, 64)), jnp.bfloat16)
bench("bf16 qK^T bh=256 T=1536 D=64",
      lambda q, k: jnp.einsum("bqd,bkd->bqk", q, k), q, k,
      flops=2 * 256 * 1536 * 1536 * 64)
print(f"measured ceiling: {ceil:.1f} TF/s = {ceil/PEAK*1e14:.1f}% of datasheet 197",
      flush=True)
