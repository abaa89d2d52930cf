"""Full-scale decode numerics study (r5, follows perf/r5_int8_identity.log).

The r4 VERDICT asked for full-scale int8-vs-bf16 token identity (small.en
dims, 51864 vocab, B=128, 224 greedy steps). The direct test FAILED — and
the failure is informative: with RANDOM weights the greedy trajectory is
chaotic. This probe establishes the controls:

  1. rerun determinism          (same config twice -> bit-identical?)
  2. batch-split invariance     (B=64 vs 2x B=32), bf16 AND int8 — if bf16
                                flips rows too, the flips are an XLA
                                batch-tiling property, not an int8 defect
  3. int8-vs-bf16 divergence    (first-divergence step distribution)
  4. first-step top-2 logit gap (how much perturbation flips an argmax?)

Run on the chip: PYTHONPATH=/root/repo:/root/.axon_site python perf/r5_decode_numerics.py
Committed log: perf/r5_decode_numerics.log
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import olmoasr_tpu.cache_config  # noqa: F401

os.environ.setdefault("OLMOASR_DECODE_CHUNK", "224")

import jax
import jax.numpy as jnp
import numpy as np

from olmoasr_tpu.decoding import (
    DecodingOptions,
    _decode_greedy_jit,
    _decode_prefill_jit,
    build_filter_config,
)
from olmoasr_tpu.models import whisper as m
from olmoasr_tpu.models.dims import VARIANT_TO_DIMS
from olmoasr_tpu.tokenizer import get_tokenizer

SAMPLE_LEN = 224
B = 64

dims = VARIANT_TO_DIMS["small.en"]
params = m.init_params(jax.random.PRNGKey(0), dims, include_padding_token=False)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
tokenizer = get_tokenizer(False, language="en", task="transcribe")
options = DecodingOptions(language="en", without_timestamps=False)
prompt = list(tokenizer.sot_sequence)
cfg = build_filter_config(tokenizer, options, len(prompt), dims.n_vocab)
rng = np.random.default_rng(0)
mel = jnp.asarray(rng.standard_normal((B, dims.n_mels, 3000)) * 0.3, jnp.float32)
prompt_arr = jnp.asarray([prompt] * B, jnp.int32)


def greedy(mel_, prm_, quant):
    toks, _, _, _ = _decode_greedy_jit(
        params, dims, mel_, prm_, cfg, SAMPLE_LEN, len(prompt), 0,
        jnp.float32(0.0), jax.random.PRNGKey(0), jnp.bfloat16, quant,
    )
    return np.asarray(toks)


def split_rows(quant, half):
    full = greedy(mel, prompt_arr, quant)
    parts = [
        greedy(mel[i : i + half], prompt_arr[i : i + half], quant)
        for i in range(0, B, half)
    ]
    split = np.concatenate(parts, axis=0)
    return int((full != split).any(axis=1).sum()), full


print(f"config: small.en dims, B={B}, {SAMPLE_LEN} steps, random bf16 weights")

# 1. rerun determinism
a = greedy(mel, prompt_arr, True)
b = greedy(mel, prompt_arr, True)
print(f"rerun determinism int8  B={B}: {int((a != b).any(axis=1).sum())}/{B} rows differ")
a16 = greedy(mel, prompt_arr, False)
b16 = greedy(mel, prompt_arr, False)
print(f"rerun determinism bf16  B={B}: {int((a16 != b16).any(axis=1).sum())}/{B} rows differ")

# 2. batch-split invariance, both dtypes
n_bf16, full_bf16 = split_rows(False, B // 2)
n_int8, full_int8 = split_rows(True, B // 2)
print(f"batch-split B={B} vs 2xB={B//2}:  bf16 {n_bf16}/{B} rows flip   int8 {n_int8}/{B} rows flip")

# 3. int8-vs-bf16 divergence structure
diff = full_int8 != full_bf16
rows = diff.any(axis=1)
first = np.where(rows, diff.argmax(axis=1), SAMPLE_LEN)
print(f"int8-vs-bf16 B={B}: {int(rows.sum())}/{B} rows differ, "
      f"{int(diff.sum())}/{diff.size} tokens")
q = np.percentile(first[rows], [0, 25, 50, 75, 100]) if rows.any() else []
print(f"first-divergence step percentiles (diverged rows): {q}")

# 4. first-step top-2 logit gap of the random model (the scale a
#    perturbation must beat to preserve the argmax)
carry, _, _ = _decode_prefill_jit(
    params, dims, mel, prompt_arr, cfg, len(prompt), SAMPLE_LEN, 0,
    jax.random.PRNGKey(0), jnp.bfloat16, False,
)
logits = np.asarray(carry[4], np.float32)  # (B, V) next-token logits
top2 = np.partition(logits, -2, axis=-1)[:, -2:]
gap = top2[:, 1] - top2[:, 0]
print(f"first-step top-2 logit gap: median {np.median(gap):.4f}  "
      f"p10 {np.percentile(gap, 10):.4f}  max {gap.max():.4f}  "
      f"(bf16 ulp at |logit|~{np.abs(logits).max():.1f}: "
      f"{np.spacing(np.float32(np.abs(logits).max())) * 256:.4f} per 8-bit mantissa)")
