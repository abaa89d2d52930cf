"""Profile the beam-search decode chunk on TPU: per-op device-time breakdown.
Usage: python perf/profile_beam.py [B] [K]"""

import glob
import os
import sys
import time

import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np

import jax
import jax.numpy as jnp

from olmoasr_tpu.decoding import (
    DecodingOptions,
    _beam_chunk_jit,
    _beam_prefill_jit,
    build_filter_config,
)
from olmoasr_tpu.models.dims import VARIANT_TO_DIMS
from olmoasr_tpu.tokenizer import get_tokenizer
from olmoasr_tpu.models import whisper as m

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
K = int(sys.argv[2]) if len(sys.argv) > 2 else 5
CHUNK = 32
variant = "small.en"
dims = VARIANT_TO_DIMS[variant]
params = m.init_params(jax.random.PRNGKey(0), dims, include_padding_token=False)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

tokenizer = get_tokenizer(False, language="en", task="transcribe")
options = DecodingOptions(language="en", without_timestamps=True, beam_size=K)
prompt = list(tokenizer.sot_sequence_including_notimestamps)
cfg = build_filter_config(tokenizer, options, len(prompt), dims.n_vocab)

rng = np.random.default_rng(0)
mel = jnp.asarray(rng.standard_normal((B, dims.n_mels, 3000)) * 0.3, jnp.float32)
prompt_arr = jnp.asarray([prompt] * B, jnp.int32)
key = jax.random.PRNGKey(0)

sample_len = 224
carry, probs, af = _beam_prefill_jit(
    params, dims, mel, prompt_arr, cfg, sample_len, len(prompt), K, 0,
    jnp.bfloat16, kv_quant=True, max_candidates=K,
)


def run_chunk(carry, start):
    return _beam_chunk_jit(
        params, dims, carry, jnp.int32(start), cfg, CHUNK, B, K
    )


carry = run_chunk(carry, 0)  # compile
_ = np.asarray(carry[1][:, 0])
t0 = time.perf_counter()
carry = run_chunk(carry, CHUNK)
_ = np.asarray(carry[1][:, 0])
dt = time.perf_counter() - t0
print(f"chunk of {CHUNK} steps: {dt*1e3:.1f} ms -> {dt/CHUNK*1e3:.3f} ms/step")

trace_dir = "/tmp/beam_trace"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(2, 5):
    carry = run_chunk(carry, i * CHUNK)
_ = np.asarray(carry[1][:, 0])
jax.profiler.stop_trace()

xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
if not xplanes:
    sys.exit(0)

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402
from collections import defaultdict  # noqa: E402

total_by_name = defaultdict(float)
for path in xplanes:
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                total_by_name[name] += ev.duration_ps / 1e9  # ms
items = sorted(total_by_name.items(), key=lambda kv: -kv[1])
total = sum(v for _, v in items)
print(f"total device time: {total:.2f} ms over 3 chunks ({3*CHUNK} steps)")
for name, ms in items[:45]:
    print(f"{ms:9.3f} ms  {100*ms/total:5.1f}%  {name[:110]}")
