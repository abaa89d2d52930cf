"""Flash fwd block_b sweep at the training shape (see probe_attn.py)."""
import os, sys, time
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
D, H = 1024, 16
rng = np.random.default_rng(0)
T = 1536
mkq = lambda: jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
q, k, v = mkq(), mkq(), mkq()

from olmoasr_tpu.ops import flash as flash_mod

def bench(name, fn, *args):
    g = lambda *a: jnp.sum(fn(*a).astype(jnp.float32)) if not isinstance(fn(*a), tuple) else None
    f = jax.jit(lambda *a: jax.tree.reduce(lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), jnp.float32(0)))
    _ = float(f(*args))
    t0 = time.perf_counter(); N = 20
    for _ in range(N): out = f(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / N
    flops_fwd = 2*2*B*H*T*T*(D//H)
    print(f"{name:44s} {dt*1e3:8.2f} ms  {flops_fwd/dt/1e12:6.1f} TF/s-fwd-equiv", flush=True)

for bb in [1,2,4,8,16]:
    for fwd_blk in [512,1536]:
        os.environ["OLMOASR_FLASH_FWD_BLOCK"] = str(fwd_blk)
        os.environ["OLMOASR_FLASH_BLOCK_B"] = str(bb)
        fn = lambda q,k,v: flash_mod.flash_self_attention(q,k,v,H)
        loss = lambda q,k,v: jnp.sum(flash_mod.flash_self_attention(q,k,v,H).astype(jnp.float32))
        try:
            bench(f"flash fwd bb{bb} f{fwd_blk}", fn, q,k,v)
            bench(f"flash fwd+bwd bb{bb} f{fwd_blk}", jax.grad(loss,(0,1,2)), q,k,v)
        except Exception as e:
            print(f"bb{bb} f{fwd_blk}: {type(e).__name__}: {str(e)[:130]}", flush=True)
