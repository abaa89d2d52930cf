"""Break down the long-form blocking prefix (bench longform axis, greedy):
chunk-0 host build + dispatch | chunk-0 H2D transfer | mel write + sync.
The bench's upload_prefix_s is the sum; this probe tells which leg to
attack. Run on the real chip: python perf/probe_prefix.py
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp

from olmoasr_tpu.api import build_model
from olmoasr_tpu.transcribe import transcribe_many, _StreamedMelGroup
from olmoasr_tpu.audio import N_SAMPLES

os.environ.setdefault("OLMOASR_DECODE_CHUNK", "224")

variant = "small.en"
n_files, file_seconds, batch = 32, 120.0, 32

model = build_model(variant, inference=True, param_dtype=np.float32)
model.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.params)
rng = np.random.default_rng(0)
wavs = [
    np.round(rng.standard_normal(int(16000 * file_seconds)) * 0.05 * 32768)
    .clip(-32768, 32767)
    .astype(np.float32)
    / 32768.0
    for _ in range(n_files)
]
kwargs = dict(
    temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    beam_size=None, best_of=None,
    compression_ratio_threshold=None, logprob_threshold=None,
    no_speech_threshold=None, kv_quant=True, verbose=None,
    without_timestamps=True,
)
# warm every program
transcribe_many(model, wavs, batch_size=batch, **kwargs)

max_len = -(-len(wavs[0]) // N_SAMPLES) * N_SAMPLES

for rep in range(3):
    t0 = time.perf_counter()
    grp = _StreamedMelGroup(list(wavs), max_len, model.dims.n_mels)
    t_build = time.perf_counter() - t0  # chunk-0 build + all dispatches

    c0 = grp.chunks[0]
    while not c0.is_ready():
        time.sleep(0.002)
    t_xfer = time.perf_counter() - t0 - t_build  # transfer completes

    grp.ensure(0)
    _ = float(np.asarray(grp.rowmax[0]))
    t_mel = time.perf_counter() - t0 - t_build - t_xfer
    total = time.perf_counter() - t0
    print(
        f"rep{rep}: build+dispatch {t_build:.3f}s | transfer-wait "
        f"{t_xfer:.3f}s | mel+sync {t_mel:.3f}s | total {total:.3f}s",
        flush=True,
    )
    grp.finish()
    del grp
