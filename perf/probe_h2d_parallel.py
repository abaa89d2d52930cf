"""Host->device upload: single stream vs chunked concurrent device_put.

The long-form bottleneck is the PCM upload through the tunneled chip
(~10-30MB/s, fluctuating). If the transfer path multiplexes (gRPC
substreams), splitting one big put into K concurrent puts may raise
aggregate bandwidth; if it serializes, K-way splitting is free but useless.
This probe times: one (32, 1920960) int16 put (123MB) vs the same bytes as
K per-slice puts dispatched back-to-back (K=4 slices of 30.7MB), vs K=16
(7.7MB each), vs 2 concurrent Python threads each putting half.

Sync rule (perf/r4_timing.md): a scalar fetch of a reduction over the
uploaded bytes forces real arrival; block_until_ready can return early.
Run 3 reps per variant; report each (tunnel variance is +-20%).
"""
import os, sys, time, threading
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

ROWS, SLICE = 32, 480240
NSLICES = 4
host = np.random.default_rng(0).integers(
    -1000, 1000, (ROWS, NSLICES * SLICE), np.int16
)
MB = host.nbytes / 1e6


@jax.jit
def _touch(*arrs):
    return sum(jnp.sum(a[:, ::997].astype(jnp.int32)) for a in arrs)


def sync(*arrs):
    return int(np.asarray(_touch(*arrs)))


def rep(name, fn, n=3):
    for i in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{name:24s} rep{i}  {dt:6.2f}s  {MB/dt:6.1f} MB/s", flush=True)


def one_put():
    a = jax.device_put(host)
    sync(a)


def k_puts(k):
    w = host.shape[1] // k
    arrs = [jax.device_put(np.ascontiguousarray(host[:, j*w:(j+1)*w]))
            for j in range(k)]
    sync(*arrs)


def threaded(k):
    w = host.shape[1] // k
    out = [None] * k
    def put(j):
        out[j] = jax.device_put(np.ascontiguousarray(host[:, j*w:(j+1)*w]))
        out[j].block_until_ready()
    ts = [threading.Thread(target=put, args=(j,)) for j in range(k)]
    for t in ts: t.start()
    for t in ts: t.join()
    sync(*out)


sync(jax.device_put(host[:2, :SLICE]))  # warm the path
rep("one_put_123MB", one_put)
rep("4_puts_seq_dispatch", lambda: k_puts(4))
rep("16_puts_seq_dispatch", lambda: k_puts(16))
rep("2_threads", lambda: threaded(2))
rep("4_threads", lambda: threaded(4))


# --- upload/compute overlap: can device_put hide behind a running chain? ---
# The streamed long-form design assumes decode rounds hide slice uploads.
# Measure: (a) compute chain alone, (b) upload alone, (c) chain dispatched
# FIRST then uploads, both synced — if (c) ~ max(a, b) the transport
# overlaps compute; if (c) ~ a + b it serializes and streaming can only
# pipeline against OTHER uploads, not against decode.
W = jnp.asarray(np.random.default_rng(1).standard_normal((4096, 4096)),
                jnp.bfloat16)


from functools import partial


@partial(jax.jit, static_argnums=(1,))
def chain(x, n):
    def body(c, _):
        return jnp.tanh(c @ W), None
    y, _ = jax.lax.scan(body, x, None, length=n)
    return jnp.sum(y.astype(jnp.float32))


N_CHAIN = int(os.environ.get("PROBE_CHAIN", "400"))
x0 = jnp.asarray(np.random.default_rng(2).standard_normal((4096, 4096)),
                 jnp.bfloat16)
_ = float(chain(x0, N_CHAIN))  # compile + warm the big chain


def compute_only():
    _ = float(chain(x0, N_CHAIN))


def overlap():
    r = chain(x0, N_CHAIN)  # dispatched, running on device
    a = jax.device_put(host)  # 123MB while the chain runs
    sync(a)
    _ = float(r)


rep("compute_chain_only", compute_only)
rep("upload_only", one_put)
rep("chain_then_upload", overlap)
