"""Wall-time bucket breakdown of transcribe_many on the real chip.

Monkeypatches timing hooks around window collection, batched decode, and
consume/seek to find where long-form wall time goes (478 RTFx vs 1378
short-form). Run: PYTHONPATH=.:/root/.axon_site python perf/profile_longform.py
"""

import os
import time

import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np

import jax.numpy as jnp

os.environ.setdefault("OLMOASR_DECODE_CHUNK", "224")

from olmoasr_tpu import transcribe as tm
from olmoasr_tpu.api import build_model

buckets = {"window": 0.0, "decode": 0.0, "consume": 0.0, "stft": 0.0}

orig_decode = tm._decode_batch_with_fallback
orig_window = tm._FileState.current_window
orig_consume = tm._FileState.consume
orig_mel = tm.log_mel_spectrogram


def timed(bucket, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        buckets[bucket] += time.perf_counter() - t0
        return out
    return wrap


tm._decode_batch_with_fallback = timed("decode", orig_decode)
tm._FileState.current_window = timed("window", orig_window)
tm._FileState.consume = timed("consume", orig_consume)
tm.log_mel_spectrogram = timed("stft", orig_mel)

model = build_model("small.en", inference=True, param_dtype=np.float32)
import jax

model.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)

rng = np.random.default_rng(0)
n_files, file_seconds, batch = 64, 120.0, 64
wavs = [
    (rng.standard_normal(int(16000 * file_seconds)) * 0.05).astype(np.float32)
    for _ in range(n_files)
]
kwargs = dict(
    temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold=None, logprob_threshold=None,
    no_speech_threshold=None, kv_quant=True, verbose=None,
    without_timestamps=True,
)
tm.transcribe_many(model, wavs, batch_size=batch, **kwargs)  # warm
for k in buckets:
    buckets[k] = 0.0
t0 = time.perf_counter()
tm.transcribe_many(model, wavs, batch_size=batch, **kwargs)
wall = time.perf_counter() - t0
other = wall - sum(buckets.values())
print(f"wall {wall:.2f}s  RTFx {n_files*file_seconds/wall:.1f}")
for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
    print(f"  {k:8s} {v:6.2f}s  {100*v/wall:5.1f}%")
print(f"  other    {other:6.2f}s  {100*other/wall:5.1f}%")
