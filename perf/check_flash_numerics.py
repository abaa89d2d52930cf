"""Verify flash (pallas) training attention matches the XLA path on TPU.

Compares forward_train logits and grads with flash on/off on small dims
(real 1500/448 contexts, tiny layer count) — tolerance bf16-scale.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from olmoasr_tpu.models import whisper as m
from olmoasr_tpu.models.dims import ModelDimensions

assert jax.default_backend() == "tpu", jax.default_backend()

dims = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=128, n_audio_head=2,
    n_audio_layer=2, n_vocab=51864, n_text_ctx=448, n_text_state=128,
    n_text_head=2, n_text_layer=2,
)
params = m.init_params(jax.random.PRNGKey(0), dims, include_padding_token=True)
rng = np.random.default_rng(0)
B = 2
mel = jnp.asarray(rng.standard_normal((B, 80, 3000)) * 0.3, jnp.float32)
toks = jnp.asarray(rng.integers(0, 51864, (B, 448)), jnp.int32)
pm = np.zeros((B, 448, 448), np.float32)
pm[0, :, 300:] = -np.inf  # sample 0 padded at 300; sample 1 full
pm = jnp.asarray(pm)


def loss(params, flash):
    logits = m.forward_train(
        params, dims, mel, toks, pm, compute_dtype=jnp.bfloat16, flash=flash
    )
    # mean over valid region only (pad positions differ by design)
    w = jnp.ones((B, 448, 1))
    w = w.at[0, 300:].set(0.0)
    return jnp.sum(jnp.tanh(logits / 8) * w) / jnp.sum(w)


f_ref = jax.jit(lambda p: loss(p, False))
f_flash = jax.jit(lambda p: loss(p, True))
l0, l1 = float(f_ref(params)), float(f_flash(params))
rel = abs(l0 - l1) / max(abs(l0), 1e-6)
print(f"fwd: xla={l0:.6f} flash={l1:.6f} rel={rel:.2e}")
assert rel < 1e-3, "forward mismatch"  # bf16-dot rounding is ~1e-4 relative

g0 = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
g1 = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
leaves0, leaves1 = jax.tree.leaves(g0), jax.tree.leaves(g1)
worst = 0.0
for a, b in zip(leaves0, leaves1):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    denom = max(np.abs(a).max(), 1e-6)
    worst = max(worst, float(np.abs(a - b).max() / denom))
print(f"grad worst rel diff: {worst:.2e}")
assert worst < 5e-2, "grad mismatch"
print("FLASH NUMERICS OK")
