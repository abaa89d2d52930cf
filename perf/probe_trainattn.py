"""Time + validate the specialized training attention kernel on the chip."""
import os, sys, time
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp
from olmoasr_tpu.models.whisper import sdpa
from olmoasr_tpu.ops.train_attention import enc_self_attention
from olmoasr_tpu.ops import flash as flash_mod

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
T, D, H = 1500, 1024, 16
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B,T,D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B,T,D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B,T,D)), jnp.bfloat16)
flops_fwd = 2*2*B*H*T*T*(D//H)

def bench(name, fn, *args):
    f = jax.jit(lambda *a: jax.tree.reduce(lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), jnp.float32(0)))
    _ = float(f(*args))
    t0 = time.perf_counter(); N = 20
    for _ in range(N): out = f(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:40s} {dt*1e3:8.2f} ms  {flops_fwd/dt/1e12:6.1f} TF/s-fwd-equiv", flush=True)

# numerics on chip vs sdpa
ref = jax.jit(lambda q,k,v: sdpa(q,k,v,H,None))(q,k,v)
out = jax.jit(lambda q,k,v: enc_self_attention(q,k,v,H))(q,k,v)
print("fwd max abs diff:", float(jnp.max(jnp.abs(ref.astype(jnp.float32)-out.astype(jnp.float32)))), flush=True)
gr = jax.jit(jax.grad(lambda q,k,v: jnp.sum(sdpa(q,k,v,H,None).astype(jnp.float32)**2), (0,1,2)))(q,k,v)
gn = jax.jit(jax.grad(lambda q,k,v: jnp.sum(enc_self_attention(q,k,v,H).astype(jnp.float32)**2), (0,1,2)))(q,k,v)
for nm, a, b in zip("qkv", gr, gn):
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32))))
    r = d/(float(jnp.max(jnp.abs(a.astype(jnp.float32))))+1e-9)
    print(f"d{nm} rel {r:.3g}", flush=True)

bench("kernel fwd", lambda q,k,v: enc_self_attention(q,k,v,H), q,k,v)
bench("kernel fwd+bwd", jax.grad(lambda q,k,v: jnp.sum(enc_self_attention(q,k,v,H).astype(jnp.float32)), (0,1,2)), q,k,v)
bench("flash fwd", lambda q,k,v: flash_mod.flash_self_attention(q,k,v,H), q,k,v)
bench("flash fwd+bwd", jax.grad(lambda q,k,v: jnp.sum(flash_mod.flash_self_attention(q,k,v,H).astype(jnp.float32)), (0,1,2)), q,k,v)
