"""Does a host->device transfer stream WHILE the device computes, through
the axon tunnel? Determines whether long-form PCM upload can be hidden
behind decode (VERDICT r3 item #5).

Legs:
  upload     : device_put of SZ MB int16, synced — baseline transfer time
  compute    : chained matmul loop, synced — baseline compute time
  overlap    : dispatch device_put, immediately run the compute chain,
               then sync both. If transfers stream in background,
               t_overlap ~= max(t_up, t_comp); if serialized, ~= sum.
Run: python perf/probe_h2d.py [MB]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 64
pcm = np.random.default_rng(0).integers(-1000, 1000,
                                        (MB * 2**20 // 2,), np.int16)

a = jnp.asarray(np.random.default_rng(1).standard_normal((2048, 2048)),
                jnp.bfloat16)


import functools


@functools.partial(jax.jit, static_argnums=(1,))
def chain(x, n_iter):
    def body(c, _):
        return jnp.tanh(c @ a), None
    return jax.lax.scan(body, x, None, length=n_iter)[0]


def sync(x):
    _ = float(jnp.sum(x.ravel()[:1]).ravel()[0])


# warm up compile + transfer path
sync(chain(a, 5))
sync(jax.device_put(pcm[: 2**20]))

# calibrate compute length to ~ transfer time
t0 = time.perf_counter(); buf = jax.device_put(pcm); sync(buf)
t_up = time.perf_counter() - t0
del buf

t0 = time.perf_counter(); sync(chain(a, 200))
t_c200 = time.perf_counter() - t0
n_iter = max(int(200 * t_up / t_c200), 50)

t0 = time.perf_counter(); sync(chain(a, n_iter))
t_comp = time.perf_counter() - t0

t0 = time.perf_counter()
buf = jax.device_put(pcm)          # dispatch transfer first
out = chain(a, n_iter)             # then compute (independent data)
sync(out); sync(buf)
t_both = time.perf_counter() - t0

print(f"upload {MB}MB int16: {t_up:.2f}s ({MB/t_up:.1f} MB/s)")
print(f"compute chain x{n_iter}: {t_comp:.2f}s")
print(f"overlapped: {t_both:.2f}s  (sum={t_up+t_comp:.2f}, "
      f"max={max(t_up, t_comp):.2f}) -> overlap efficiency "
      f"{(t_up + t_comp - t_both) / min(t_up, t_comp) * 100:.0f}%")
