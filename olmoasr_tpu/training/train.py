"""Training: loss, optimizer, LR schedule, and the sharded train step.

TPU-native replacement for the reference's DDP/FSDP trainers
(``/root/reference/scripts/training/train_timestamps.py`` and
``train_fsdp_timestamps.py``): one jit-compiled SPMD train step over a
(data, fsdp) mesh, with gradient accumulation as a ``lax.scan`` over
microbatches, bf16 compute with fp32 params/optimizer (no GradScaler needed),
remat per block, and the exact reference recipe:

  AdamW β=(0.9,0.98) ε=1e-6, weight decay 0.1, peak LR per variant, linear
  warmup over 0.2% of steps then linear decay, max grad norm 1.0
  (train_timestamps.py:706-783,2110-2116; BASELINE.md Table 6).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from olmoasr_tpu.models import whisper as model_mod
from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.models.whisper import PADDING_TOKEN
from olmoasr_tpu.parallel import mesh as mesh_mod

# peak LR per variant (train_timestamps.py defaults / tech report Table 6)
VARIANT_TO_LR = {
    "tiny": 1.5e-3, "base": 1.5e-3, "small": 1.5e-3,
    "medium": 1.5e-3, "large": 1.5e-3,
}


@dataclass(frozen=True)
class TrainConfig:
    train_steps: int = 524_288
    eff_batch_size: int = 512
    micro_batch_size: int = 8
    peak_lr: float = 1.5e-3
    weight_decay: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-6
    max_grad_norm: float = 1.0
    warmup_frac: float = 0.002  # warmup = 0.2% of steps (train_timestamps.py:770)
    remat: bool = True
    compute_dtype: Any = jnp.bfloat16
    # bf16 first moment halves optimizer HBM (769M-param medium.en: 3.1GB
    # saved), standard practice; fp32 default = exact reference parity
    mu_dtype: Any = None
    # bf16 SECOND moment (nu): frees another 1.5GB of resident HBM on
    # medium.en and cuts the optimizer pass's HBM traffic. nu is a smooth
    # EMA of g^2 and adam divides by sqrt(nu) — bf16's ~3 decimal digits
    # perturb the update by <=0.4% relative, far under the grad noise; the
    # moment UPDATE still computes in f32 (cast on store only). fp32
    # default = exact reference parity.
    nu_dtype: Any = None
    # flash (Pallas fwd+bwd) attention in training: avoids materializing the
    # encoder's (B, H, 1500, 1500) score tensors in fwd AND bwd. Measured on
    # v5e (medium.en B=8, perf/r2_train_flash3.log): encoder flash with
    # bwd_block=512 710ms/microstep vs XLA 756ms -> default ON. Decoder flash
    # measured SLOWER (867-1257ms; small 448-query shapes) -> gated off by
    # default via OLMOASR_TRAIN_FLASH_DEC=0.
    encoder_flash: Optional[bool] = None

    def resolved_flash(self) -> Optional[bool]:
        if self.encoder_flash is not None:
            return self.encoder_flash
        import os

        return os.environ.get("OLMOASR_TRAIN_FLASH", "1") == "1"

    @property
    def warmup_steps(self) -> int:
        return max(int(self.train_steps * self.warmup_frac), 1)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # scalar int32


def lr_schedule(config: TrainConfig):
    """Linear warmup to peak over 0.2% of steps, then linear decay to 0
    (train_timestamps.py:738-783)."""
    warmup = config.warmup_steps
    total = config.train_steps

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup
        decay = (total - step) / jnp.maximum(total - warmup, 1)
        return config.peak_lr * jnp.where(step < warmup, warm, jnp.maximum(decay, 0.0))

    return fn


def _scale_by_adam_cast(b1, b2, eps, mu_dtype, nu_dtype):
    """optax.scale_by_adam with independent storage dtypes for BOTH moments
    (optax only exposes mu_dtype). Moment math runs in f32; the cast happens
    on store. Bias correction and eps placement match optax/torch AdamW:
    update = (mu/bc1) / (sqrt(nu/bc2) + eps)."""

    def init(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        f32 = jnp.float32
        mu = jax.tree.map(
            lambda m, g: (
                b1 * m.astype(f32) + (1 - b1) * g.astype(f32)
            ).astype(m.dtype),
            state.mu, updates,
        )
        nu = jax.tree.map(
            lambda v, g: (
                b2 * v.astype(f32) + (1 - b2) * jnp.square(g.astype(f32))
            ).astype(v.dtype),
            state.nu, updates,
        )
        c = count.astype(f32)
        bc1 = 1 - b1 ** c
        bc2 = 1 - b2 ** c
        out = jax.tree.map(
            lambda m, v: (m.astype(f32) / bc1)
            / (jnp.sqrt(v.astype(f32) / bc2) + eps),
            mu, nu,
        )
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    if config.nu_dtype is not None:
        return optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            _scale_by_adam_cast(
                config.beta1, config.beta2, config.eps,
                config.mu_dtype, config.nu_dtype,
            ),
            optax.add_decayed_weights(config.weight_decay),
            optax.scale_by_learning_rate(lr_schedule(config)),
        )
    return optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(
            learning_rate=lr_schedule(config),
            b1=config.beta1,
            b2=config.beta2,
            eps=config.eps,
            weight_decay=config.weight_decay,
            mu_dtype=config.mu_dtype,
        ),
    )


def _chunked_logit_stats(
    hidden: jax.Array,  # (B, T, D) compute dtype
    embedding: jax.Array,  # (V, D) — incl. the n_vocab+1 padding row
    targets: jax.Array,  # (B, T) int32, already clamped to valid ids
    chunk: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(lse, target_logit, argmax) over the vocab WITHOUT materializing the
    (B, T, V) logits tensor: a checkpointed ``lax.scan`` over vocab chunks
    carries the online logsumexp / running argmax / target gather. The
    backward pass recomputes each chunk's logits and accumulates d_hidden and
    the per-chunk embedding grads — peak activation memory drops from
    2 x (B, T, 51865) fp32 (logits + d_logits, ~1.5GB at micro_bs=8) to
    (B, T, chunk). Matmul dtype matches the dense path (bf16 MXU, f32 stats)."""
    V = embedding.shape[0]
    nc = -(-V // chunk)
    embc = jnp.pad(embedding, ((0, nc * chunk - V), (0, 0))).reshape(
        nc, chunk, -1
    )
    offs = jnp.arange(nc, dtype=jnp.int32) * chunk
    B, T = targets.shape
    neg = jnp.float32(-1e30)

    def body(carry, xs):
        ec, off = xs
        m, s, amax, aidx, tgt = carry
        lg = (hidden @ ec.astype(hidden.dtype).T).astype(jnp.float32)
        ids = off + jnp.arange(chunk, dtype=jnp.int32)
        lg = jnp.where(ids[None, None, :] < V, lg, neg)  # mask pad rows
        cmax = jnp.max(lg, axis=-1)  # (B, T)
        nm = jnp.maximum(m, cmax)
        s = s * jnp.exp(m - nm) + jnp.sum(jnp.exp(lg - nm[..., None]), axis=-1)
        carg = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        aidx = jnp.where(cmax > amax, off + carg, aidx)
        amax = jnp.maximum(amax, cmax)
        loc = targets - off
        hit = (loc >= 0) & (loc < chunk)
        tl = jnp.take_along_axis(
            lg, jnp.clip(loc, 0, chunk - 1)[..., None], axis=-1
        )[..., 0]
        tgt = jnp.where(hit, tl, tgt)
        return (nm, s, amax, aidx, tgt), None

    init = (
        jnp.full((B, T), neg), jnp.zeros((B, T), jnp.float32),
        jnp.full((B, T), neg), jnp.zeros((B, T), jnp.int32),
        jnp.full((B, T), neg),
    )
    (m, s, _, aidx, tgt), _ = jax.lax.scan(
        jax.checkpoint(body), init, (embc, offs)
    )
    return m + jnp.log(s), tgt, aidx


def loss_fn(
    params,
    dims: ModelDimensions,
    mel: jax.Array,  # (B, n_mels, 3000)
    text_input: jax.Array,  # (B, 448)
    text_target: jax.Array,  # (B, 448), PADDING_TOKEN where ignored
    padding_mask: Optional[jax.Array],  # (B, 448) additive per-key bias (or legacy (B, 448, 448)) or None
    *,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    flash: Optional[bool] = None,
    return_pred: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Teacher-forced cross entropy with ignore_index=51864
    (train_timestamps.py:1444-1450). ``return_pred`` adds the (B, T) argmax
    ids to aux (validation WER fetches these instead of the full logits)."""
    import os as _os

    if mel.ndim == 2:
        # device_mel transport: the loader shipped raw (B, 480000) PCM
        # (int16 when possible — half the H2D bytes of an f32 mel) and the
        # log-mel runs HERE on the MXU as a strided conv-DFT
        # (audio.py::_log_mel_jax; ~0.02% of the step FLOPs). This removes
        # the host-side STFT, the input pipeline's dominant cost.
        from olmoasr_tpu.audio import _log_mel_jax

        mel = _log_mel_jax(mel, dims.n_mels, 0)

    valid = text_target != PADDING_TOKEN
    safe_target = jnp.where(valid, text_target, 0)
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    chunk = int(_os.environ.get("OLMOASR_CE_CHUNK", "0"))
    if chunk > 0:
        hidden = model_mod.forward_train(
            params, dims, mel, text_input, padding_mask,
            compute_dtype=compute_dtype, remat=remat, flash=flash,
            return_hidden=True,
        )  # (B, T, D)
        lse, tgt_logit, pred = _chunked_logit_stats(
            hidden, params["decoder"]["token_embedding"], safe_target, chunk
        )
    else:
        logits = model_mod.forward_train(
            params, dims, mel, text_input, padding_mask,
            compute_dtype=compute_dtype, remat=remat, flash=flash,
        )  # (B, T, V) fp32
        # logsumexp-form CE: identical to -log_softmax[target] but never
        # materializes the (B, T, V) fp32 logprob tensor (744MB at micro_bs=8)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt_logit = jnp.take_along_axis(
            logits, safe_target[..., None], axis=-1
        )[..., 0]
        pred = jnp.argmax(logits, axis=-1)
    nll = lse - tgt_logit
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / n_valid
    # in-loop teacher-forced accuracy (cheap train-WER proxy;
    # the reference logs argmax-decode WER at train_timestamps.py:1077-1196)
    acc = jnp.sum((pred == text_target) & valid) / n_valid
    aux = {"accuracy": acc, "n_tokens": n_valid}
    if return_pred:
        aux["pred"] = pred
    return loss, aux


def make_train_step(
    dims: ModelDimensions,
    config: TrainConfig,
    optimizer: optax.GradientTransformation,
    flash: Optional[bool] = None,
):
    """Build the jitted train step.

    The batch is (accum, micro_B, ...) — gradient accumulation is a
    ``lax.scan`` over the leading axis, so one XLA program covers the whole
    optimizer step (the reference loops microbatches in Python:
    train_timestamps.py:1508-1549).
    """

    import os as _os

    # bf16 micro-batch grads: differentiate w.r.t. a bf16 cast of the params
    # so the cotangents — including the (L, ...) stacked per-layer grad
    # buffers the scan backward materializes — are bf16 instead of f32
    # (~1.5GB freed at the bwd peak on medium.en; buys remat-policy /
    # micro-batch headroom). The ACCUMULATOR across accum steps stays f32
    # (grads cast up before the add), and clip + adam run in f32 as before.
    # bf16 grad values (8-bit mantissa) are the standard FSDP
    # reduce-scatter precision; parity pinned in tests/test_training.py.
    grads_bf16 = _os.environ.get("OLMOASR_GRADS_BF16", "0") == "1"

    def grads_of(params, batch):
        if grads_bf16:
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p,
                params,
            )
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, dims, batch["mel"], batch["text_input"], batch["text_target"],
            batch.get("padding_mask"),
            compute_dtype=config.compute_dtype, remat=config.remat,
            flash=config.resolved_flash() if flash is None else flash,
        )
        return loss, aux, grads

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        def accum_fn(carry, micro):
            loss_sum, acc_sum, grads_sum = carry
            loss, aux, grads = grads_of(state.params, micro)
            grads_sum = jax.tree.map(
                lambda s, g: s + g.astype(s.dtype), grads_sum, grads
            )
            return (loss_sum + loss, acc_sum + aux["accuracy"], grads_sum), None

        n_accum = batch["mel"].shape[0]
        if n_accum == 1:
            # no accumulator: with OLMOASR_GRADS_BF16 the bwd peak carries
            # only the bf16 grads (no parallel f32 zeros+add buffers)
            loss_sum, aux1, grads = grads_of(
                state.params, jax.tree.map(lambda x: x[0], batch)
            )
            acc_sum = aux1["accuracy"]
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        else:
            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (loss_sum, acc_sum, grads), _ = jax.lax.scan(
                accum_fn, (jnp.float32(0), jnp.float32(0), zero_grads), batch
            )
            grads = jax.tree.map(lambda g: g / n_accum, grads)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss_sum / n_accum,
            "accuracy": acc_sum / n_accum,
            "grad_norm": optax.global_norm(grads),
            "lr": lr_schedule(config)(state.step),
        }
        return TrainState(new_params, new_opt_state, state.step + 1), metrics

    return train_step


def init_train_state(
    rng: jax.Array,
    dims: ModelDimensions,
    config: TrainConfig,
    optimizer: optax.GradientTransformation,
) -> TrainState:
    params = model_mod.init_params(rng, dims, include_padding_token=True)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# sharded (SPMD) wiring
# ---------------------------------------------------------------------------


def shard_train_state(
    state: TrainState, mesh, *, zero2: bool = False
) -> Tuple[TrainState, Any]:
    """Place params/opt state on the mesh with FSDP shardings; returns the
    sharded state and the state-sharding pytree (for jit out_shardings).

    ``zero2=True`` is the reference's SHARD_GRAD_OP / _HYBRID_SHARD_ZERO2
    (train_fsdp_timestamps.py:2437-2442): parameters stay REPLICATED (no
    per-layer all-gather in fwd/bwd) while gradients + optimizer moments are
    sharded over the fsdp axis — XLA inserts the reduce-scatter into the
    optimizer update and an all-gather of the applied updates.
    """
    full_shard = mesh_mod.param_shardings(state.params, mesh)
    rep = mesh_mod.replicated(mesh)
    p_shard = jax.tree.map(lambda _: rep, full_shard) if zero2 else full_shard

    # Optimizer moments (adamw mu/nu) are created by ``tree_map(zeros_like,
    # params)``, so they are SUBTREES with the exact treedef of params:
    # substitute the whole param-sharding tree structurally. Shape-matching
    # individual leaves (the round-1 approach) silently picks the wrong spec
    # when two params share a shape but not a sharding.
    p_struct = jax.tree.structure(state.params)

    def _is_param_tree(node) -> bool:
        if node is None:
            return False
        try:
            return jax.tree.structure(node) == p_struct
        except Exception:
            return False

    def map_opt(tree):
        # moments always take the FULL fsdp shardings — under zero2 that is
        # exactly what makes it ZeRO-2 (sharded opt state, replicated params)
        leaves, treedef = jax.tree.flatten(tree, is_leaf=_is_param_tree)
        out = [full_shard if _is_param_tree(leaf) else rep for leaf in leaves]
        return jax.tree.unflatten(treedef, out)

    state_shardings = TrainState(
        params=p_shard,
        opt_state=map_opt(state.opt_state),
        step=rep,
    )
    sharded = jax.device_put(state, state_shardings)
    return sharded, state_shardings


def make_sharded_train_step(
    dims: ModelDimensions,
    config: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    state_shardings,
):
    """jit the train step with explicit in/out shardings over the mesh.

    Batch comes in as (accum, micro_B, ...) with micro_B sharded across all
    devices; XLA inserts the gradient psum (DDP analog) and the FSDP
    all-gather/reduce-scatter from the param shardings.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    # The Pallas flash kernel defines no SPMD partitioning rule, so under a
    # multi-device mesh the kernel runs inside shard_map with the batch dim
    # sharded over every mesh axis (ops/flash.py::set_flash_mesh) — attention
    # is batch-parallel, so no collectives are needed. Semantics validated on
    # the 8-CPU virtual mesh under Pallas interpret mode
    # (tests/test_training.py::test_flash_shard_map_multidevice);
    # OLMOASR_TRAIN_FLASH_MULTICHIP=0 falls back to XLA attention.
    import os as _os

    flash = config.resolved_flash()
    if mesh.size > 1:
        if _os.environ.get("OLMOASR_TRAIN_FLASH_MULTICHIP", "1") != "1":
            flash = False
        else:
            from olmoasr_tpu.ops import flash as flash_mod

            flash_mod.set_flash_mesh(mesh)
    step_fn = make_train_step(dims, config, optimizer, flash=flash)
    batch_spec = NamedSharding(
        mesh, P(None, (mesh_mod.DATA_AXIS, mesh_mod.FSDP_AXIS))
    )
    batch_shardings = {
        "mel": batch_spec, "text_input": batch_spec,
        "text_target": batch_spec, "padding_mask": batch_spec,
    }
    rep = mesh_mod.replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, batch_shardings),
        out_shardings=(state_shardings, {
            "loss": rep, "accuracy": rep, "grad_norm": rep, "lr": rep,
        }),
        donate_argnums=(0,),
    )
