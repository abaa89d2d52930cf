"""Component decomposition of the medium.en bs16 training step (chained timing).

Pieces: full step / grad-no-opt / fwd-loss-only / encoder-grad-only /
decoder-grad-only (precomputed audio features) / optimizer-update-only.
Run: python perf/probe_split.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import olmoasr_tpu.cache_config  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp

from olmoasr_tpu.models.dims import VARIANT_TO_DIMS
from olmoasr_tpu.models import whisper as m
from olmoasr_tpu.training import train as train_mod

mb = int(os.environ.get("SPLIT_BS", "16"))
variant = os.environ.get("SPLIT_VARIANT", "medium.en")
dims = VARIANT_TO_DIMS[variant]
config = train_mod.TrainConfig(
    train_steps=1000, micro_batch_size=mb, mu_dtype=jnp.bfloat16
)
optimizer = train_mod.make_optimizer(config)
state = train_mod.init_train_state(jax.random.PRNGKey(0), dims, config, optimizer)

rng = np.random.default_rng(0)
T = dims.n_text_ctx
mel = jnp.asarray(rng.standard_normal((mb, dims.n_mels, 3000)), jnp.float32)
ti = jnp.asarray(rng.integers(0, 51864, (mb, T)), jnp.int32)
tt = jnp.asarray(rng.integers(0, 51864, (mb, T)), jnp.int32)
pm = jnp.zeros((mb, T), jnp.float32)

remat = True
cd = config.compute_dtype
flash = config.resolved_flash()


def loss_fn(params):
    loss, _ = train_mod.loss_fn(params, dims, mel, ti, tt, pm,
                                compute_dtype=cd, remat=remat, flash=flash)
    return loss


def enc_loss(params):
    feats = m.encode_audio(params, dims, mel, compute_dtype=cd, remat=remat,
                           flash=flash)
    return jnp.sum(feats.astype(jnp.float32) ** 2) * 1e-6


feats_const = m.encode_audio(state.params, dims, mel, compute_dtype=cd,
                             remat=remat, flash=flash)


def dec_loss(params):
    hidden = m.decode_train(params, dims, ti, feats_const, pm, remat=remat,
                            flash=flash, return_hidden=True)
    emb = params["decoder"]["token_embedding"]
    lse, tgt, _p = train_mod._chunked_logit_stats(hidden, emb, jnp.where(tt != 51864, tt, 0), 0) if False else (None, None, None)
    logits = hidden.astype(jnp.float32) @ emb.astype(jnp.float32).T
    lsev = jax.scipy.special.logsumexp(logits, axis=-1)
    tgtv = jnp.take_along_axis(logits, jnp.where(tt != 51864, tt, 0)[..., None], -1)[..., 0]
    return jnp.mean(lsev - tgtv)


grad_full = jax.jit(jax.grad(loss_fn))
grad_enc = jax.jit(jax.grad(enc_loss))
grad_dec = jax.jit(jax.grad(dec_loss))
fwd_only = jax.jit(loss_fn)
fwd_enc = jax.jit(enc_loss)


def timeit(name, f, *args):
    # queue timing: the device executes enqueued programs in order, so one
    # scalar fetch of the LAST output syncs the whole run (the per-step
    # train-step times are ~1s >> the ~3.7ms tunnel dispatch cost, so the
    # host stays ahead; see perf/r4_timing.md)
    out = f(*args)
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.sum(leaf).ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = f(*args)
        lf = jax.tree.leaves(o)[0]
        _ = float(jnp.sum(lf).ravel()[0])
        return time.perf_counter() - t0

    run(2)
    ts, tl = run(3), run(9)
    dt = (tl - ts) / 6
    print(f"{name:24s} {dt*1e3:9.1f} ms", flush=True)
    return dt


PIECES = {
    "fwd": lambda: timeit("fwd loss only", fwd_only, state.params),
    "fwd_enc": lambda: timeit("fwd encoder only", fwd_enc, state.params),
    "grad_enc": lambda: timeit("grad encoder only", grad_enc, state.params),
    "grad_dec": lambda: timeit("grad decoder only", grad_dec, state.params),
    "grad_full": lambda: timeit("grad full", grad_full, state.params),
    "opt": lambda: timeit(
        "optimizer update",
        jax.jit(lambda g, s: optimizer.update(g, s.opt_state, s.params)),
        jax.tree.map(lambda p: jnp.zeros_like(p), state.params), state),
}
print(f"== {variant} bs{mb} component split (chained queue timing) ==")
for piece in (sys.argv[1:] or list(PIECES)):
    PIECES[piece]()
