"""Isolate where flash loses at training shapes: fwd-only vs fwd+bwd,
encoder vs decoder flash, block sizes. medium.en, micro_bs=8, 1 chip."""

import os
import sys
import time

import numpy as np


def measure(flash_enc, flash_dec, bwd_block, fwd_only=False, block=None):
    # fresh process per config is the shell's job; this measures in-process
    import jax
    import jax.numpy as jnp

    from olmoasr_tpu.models import whisper as m
    from olmoasr_tpu.models.dims import VARIANT_TO_DIMS

    os.environ["OLMOASR_TRAIN_FLASH_DEC"] = "1" if flash_dec else "0"
    os.environ["OLMOASR_FLASH_BWD_BLOCK"] = str(bwd_block)

    dims = VARIANT_TO_DIMS["medium.en"]
    params = m.init_params(jax.random.PRNGKey(0), dims, include_padding_token=True)
    params = jax.tree.map(lambda x: x, params)
    rng = np.random.default_rng(0)
    B = 8
    mel = jnp.asarray(rng.standard_normal((B, 80, 3000)) * 0.3, jnp.float32)
    toks = jnp.asarray(rng.integers(0, 51864, (B, 448)), jnp.int32)
    pm = jnp.zeros((B, 448, 448), jnp.float32)

    def loss(p):
        logits = m.forward_train(
            p, dims, mel, toks, pm, compute_dtype=jnp.bfloat16,
            remat=not fwd_only, flash=flash_enc,
        )
        return jnp.sum(logits * 1e-6)

    if fwd_only:
        fn = jax.jit(loss)
    else:
        # reduce over ALL grads — returning a single leaf lets jit DCE the
        # rest of the backward
        def full_bwd(p):
            g = jax.grad(loss)(p)
            return sum(jnp.vdot(x, x) for x in jax.tree.leaves(g))

        fn = jax.jit(full_bwd)

    out = fn(params)
    _ = np.asarray(out).sum()
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = fn(params)
        _ = np.asarray(out).sum()
    dt = (time.perf_counter() - t0) / iters
    tag = f"enc={flash_enc} dec={flash_dec} bwd_blk={bwd_block} fwd_only={fwd_only}"
    print(f"{tag}: {dt * 1000:.1f} ms", flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--enc", type=int, default=0)
    ap.add_argument("--dec", type=int, default=0)
    ap.add_argument("--bwd_block", type=int, default=128)
    ap.add_argument("--fwd_only", type=int, default=0)
    a = ap.parse_args()
    measure(bool(a.enc), bool(a.dec), a.bwd_block, bool(a.fwd_only))
