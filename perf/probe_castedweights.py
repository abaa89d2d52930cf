"""A/B: f32 stacked weights cast per-layer inside the scan (train-state
layout) vs pre-cast bf16 weights, on the medium.en encoder fwd+bwd.

Quantifies whether hoisting the params cast out of the layer scans is worth
plumbing into the train step. Run: python perf/probe_castedweights.py
"""

import time

import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np

import jax
import jax.numpy as jnp

from olmoasr_tpu.models import whisper as m
from olmoasr_tpu.models.dims import VARIANT_TO_DIMS

dims = VARIANT_TO_DIMS["medium.en"]
B = 8
key = jax.random.PRNGKey(0)
params = m.init_params(key, dims, include_padding_token=True)  # f32
mel = jnp.asarray(
    np.random.default_rng(0).standard_normal((B, dims.n_mels, 3000)), jnp.float32
)


def loss_fn(p):
    x = m.encode_audio(p, dims, mel, compute_dtype=jnp.bfloat16, remat=True)
    return jnp.sum(x.astype(jnp.float32) ** 2)


grad_f32 = jax.jit(jax.grad(loss_fn))


def pre_cast(p):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)


@jax.jit
def grad_bf16(p):
    # cast once outside the scan; grads flow back through the cast to f32
    return jax.grad(lambda q: loss_fn(pre_cast(q)))(p)


def timeit(f, tag):
    out = f(params)
    jax.tree.leaves(out)[0].block_until_ready()
    _ = float(jax.tree.leaves(out)[0].ravel()[0])  # tunnel sync
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = f(params)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1e3:.1f} ms")
    return dt


a = timeit(grad_f32, "f32 weights, cast inside scan")
b = timeit(grad_bf16, "pre-cast bf16 weights        ")
print(f"speedup: {a/b:.3f}x")
