"""fwd/bwd-block + bf16-exp sweep for the training attention kernel."""
import os, sys, time
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp
from olmoasr_tpu.ops.train_attention import _attn_fwd, _attn_bwd, _prep, _split, _pad_t

B, T, D, H = 16, 1500, 1024, 16
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B,T,D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B,T,D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B,T,D)), jnp.bfloat16)
qh, kh, vh, bias, (Tq_pad, Tk_pad, scale) = _prep(q, k, v, H, None)
doh = _pad_t(_split(jnp.asarray(rng.standard_normal((B,T,D)), jnp.bfloat16), H), Tq_pad)
flops_fwd = 2*2*B*H*Tq_pad*Tk_pad*(D//H)

def bench(name, fn, *args):
    f = jax.jit(lambda *a: jax.tree.reduce(lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), jnp.float32(0)))
    _ = float(f(*args))
    t0 = time.perf_counter(); N = 20
    for _ in range(N): out = f(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:36s} {dt*1e3:8.2f} ms  {flops_fwd/dt/1e12:6.1f} TF/s-fwd-equiv", flush=True)

mode = sys.argv[1]  # fwd512 / bwd128 ...
kind, blk = mode[:3], int(mode[3:])
tag = f"exp{os.environ.get('OLMOASR_ATTN_BF16_EXP','0')}"
if kind == "fwd":
    bench(f"fwd bq{blk} {tag}", lambda *a: _attn_fwd(*a, H, block_q=blk), qh, kh, vh, bias)
else:
    bench(f"bwd bq{blk} {tag}", lambda *a: _attn_bwd(*a, H, block_q=blk), qh, kh, vh, doh, bias)
