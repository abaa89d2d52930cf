"""Isolate encoder self-attention cost: XLA sdpa vs Pallas flash variants.

r3 train profile shows the flash stack at ~480ms of a 1470ms medium.en bs16
step. This times fwd and fwd+bwd in isolation at the training shape
(B, T=1500/1536, D=1024, H=16): XLA sdpa, flash at several fwd/bwd blocks,
and flash at T=1536 with no segment ids (isolating the pad-masking cost).
Run: python perf/probe_attn.py [B]
"""
import os, sys, time
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp
from olmoasr_tpu.models.whisper import sdpa

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
D, H = 1024, 16
rng = np.random.default_rng(0)

def mk(T):
    f = lambda: jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    return f(), f(), f()

def bench(name, fn, *args):
    # the dev tunnel's block_until_ready does not round-trip; force a real
    # sync by fetching a scalar reduced from the output
    g = lambda *a: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), fn(*a), jnp.float32(0)
    )
    f = jax.jit(g)
    _ = float(f(*args))
    t0 = time.perf_counter(); N = 20
    for _ in range(N): out = f(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / N
    T = args[0].shape[1]
    flops_fwd = 2 * 2 * B * H * T * T * (D // H)
    print(f"{name:44s} {dt*1e3:8.2f} ms  {flops_fwd/dt/1e12:6.1f} TF/s-fwd-equiv", flush=True)
    return dt

q, k, v = mk(1500)
bench("xla sdpa fwd T1500", lambda q,k,v: sdpa(q,k,v,H,None), q,k,v)
bench("xla sdpa fwd+bwd T1500",
      jax.grad(lambda q,k,v: jnp.sum(sdpa(q,k,v,H,None).astype(jnp.float32)), (0,1,2)), q,k,v)

from olmoasr_tpu.ops import flash as flash_mod

def run_flash(tag, q, k, v, fwd_blk, bwd_blk):
    os.environ["OLMOASR_FLASH_FWD_BLOCK"] = str(fwd_blk)
    os.environ["OLMOASR_FLASH_BWD_BLOCK"] = str(bwd_blk)
    fn = lambda q,k,v: flash_mod.flash_self_attention(q,k,v,H)
    loss = lambda q,k,v: jnp.sum(flash_mod.flash_self_attention(q,k,v,H).astype(jnp.float32))
    try:
        bench(f"flash fwd {tag} f{fwd_blk}", fn, q,k,v)
        bench(f"flash fwd+bwd {tag} f{fwd_blk} b{bwd_blk}", jax.grad(loss,(0,1,2)), q,k,v)
    except Exception as e:
        print(f"flash {tag} f{fwd_blk} b{bwd_blk}: {type(e).__name__}: {str(e)[:140]}", flush=True)

for fwd_blk, bwd_blk in [(512,512),(1536,512),(768,768),(512,1536)]:
    run_flash("T1500(seg)", q, k, v, fwd_blk, bwd_blk)

q6, k6, v6 = mk(1536)  # exact 128-multiple: no segment ids, pure kernel
for fwd_blk, bwd_blk in [(512,512),(1536,512)]:
    run_flash("T1536(noseg)", q6, k6, v6, fwd_blk, bwd_blk)
