"""Profile one training step on the TPU and print a per-op time breakdown.

Same xplane-parsing approach as profile_decode.py, applied to the sharded
train step (medium.en, micro_bs=8 default, remat).
Run: python perf/profile_train.py [micro_bs] [variant]
"""

import glob
import os
import sys
import time
from collections import defaultdict

import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np

import jax
import jax.numpy as jnp

from olmoasr_tpu.models.dims import VARIANT_TO_DIMS
from olmoasr_tpu.parallel import mesh as mesh_mod
from olmoasr_tpu.training import train as train_mod

micro_bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
variant = sys.argv[2] if len(sys.argv) > 2 else "medium.en"

dims = VARIANT_TO_DIMS[variant]
mesh = mesh_mod.make_mesh(len(jax.devices()), 1)
config = train_mod.TrainConfig(
    train_steps=1000, micro_batch_size=micro_bs,
    mu_dtype=jnp.bfloat16 if os.environ.get("OLMOASR_BENCH_MU16") == "1" else None,
)
optimizer = train_mod.make_optimizer(config)
state = train_mod.init_train_state(jax.random.PRNGKey(0), dims, config, optimizer)
state, shardings = train_mod.shard_train_state(state, mesh)
step = train_mod.make_sharded_train_step(dims, config, optimizer, mesh, shardings)

rng = np.random.default_rng(0)
T = dims.n_text_ctx
batch = {
    "mel": jnp.asarray(
        rng.standard_normal((1, micro_bs, dims.n_mels, 3000)), jnp.float32
    ),
    "text_input": jnp.asarray(rng.integers(0, 51864, (1, micro_bs, T)), jnp.int32),
    "text_target": jnp.asarray(rng.integers(0, 51864, (1, micro_bs, T)), jnp.int32),
    "padding_mask": jnp.zeros((1, micro_bs, T), jnp.float32),
}

state, metrics = step(state, batch)  # compile
_ = float(metrics["loss"])
t0 = time.perf_counter()
state, metrics = step(state, batch)
_ = float(metrics["loss"])
print(f"step: {(time.perf_counter() - t0) * 1e3:.1f} ms")

trace_dir = "/tmp/train_trace"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
N = 2
for _ in range(N):
    state, metrics = step(state, batch)
_ = float(metrics["loss"])
jax.profiler.stop_trace()

xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane files:", xplanes)
if not xplanes:
    sys.exit(0)

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

def _is_container(name: str) -> bool:
    base = name.lstrip("%")
    return (
        base.isdigit()
        or base.startswith("jit_")
        or base.startswith("while")
        or base.startswith("conditional")
        or base.startswith("body")
        or base.startswith("region")
    )


def _category(name: str) -> str:
    base = name.lstrip("%").split(" ")[0]
    op = base.split(".")[0].split("(")[0]
    return op


total_by_name = defaultdict(float)
by_cat = defaultdict(float)
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
                if _is_container(name):
                    continue
                total_by_name[name] += ev.duration_ps / 1e9  # ms
                by_cat[_category(name)] += ev.duration_ps / 1e9

total = sum(total_by_name.values())
print(f"total leaf device time: {total:.2f} ms over {N} steps")
print("== by category ==")
for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{ms:9.3f} ms  {100 * ms / total:5.1f}%  {cat}")
print("== top leaf ops ==")
items = sorted(total_by_name.items(), key=lambda kv: -kv[1])
for name, ms in items[:50]:
    print(f"{ms:9.3f} ms  {100 * ms / total:5.1f}%  {name[:220]}")
