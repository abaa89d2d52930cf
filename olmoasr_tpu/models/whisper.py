"""TPU-native Whisper-architecture encoder-decoder, as pure JAX functions.

Re-design of the reference's two PyTorch model files —
``/root/reference/olmoasr/model.py`` (training: SDPA, padding+causal mask,
vocab n+1 with padding row) and ``/root/reference/olmoasr/inf_model.py``
(inference: manual attention, hook-based KV cache) — as ONE functional model:

  * Parameters are a pytree of plain jnp arrays. Transformer blocks are
    **stacked along a leading layer axis** and iterated with ``lax.scan``:
    O(1) compile time in depth, and FSDP sharding is a single annotation per
    stacked leaf instead of per-layer bookkeeping.
  * The KV cache is explicit carried state (per-layer slots in the stacked
    arrays), not forward hooks — idiomatic JAX, jit/scan compatible
    (replaces ``inf_model.py:422-453``).
  * Numerics match the reference: fp32 LayerNorm islands (``model.py:39``),
    fp32 softmax (``model.py:423-433``), q/k scaled by d_head**-0.25, exact
    (erf) GELU, logits through the tied token embedding in fp32
    (``model.py:768-770``). Matmuls run in the param dtype (bf16 on TPU).

Weight convention: linear weights are stored (in_features, out_features) so the
forward is ``x @ w + b`` (the checkpoint converter transposes from torch).
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from olmoasr_tpu.models.dims import ModelDimensions

Params = Dict[str, Any]

PADDING_TOKEN = 51864


# ---------------------------------------------------------------------------
# initialization (matches reference init: kaiming-normal fan-in weights,
# torch-default uniform biases; olmoasr/model.py:81,171,258-264,660-676)
# ---------------------------------------------------------------------------


def _kaiming(key, shape, fan_in, dtype=jnp.float32):
    std = np.sqrt(2.0 / fan_in)
    return (jax.random.normal(key, shape) * std).astype(dtype)


def _bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound).astype(dtype)


def _init_block_stack(key, n_layer: int, d: int, cross: bool) -> Params:
    """Stacked residual-attention-block parameters, leading axis = layer."""
    keys = iter(jax.random.split(key, 64))
    nxt = lambda: next(keys)
    L = n_layer
    p: Params = {
        "attn_ln_g": jnp.ones((L, d)), "attn_ln_b": jnp.zeros((L, d)),
        "attn_q_w": _kaiming(nxt(), (L, d, d), d), "attn_q_b": _bias_uniform(nxt(), (L, d), d),
        "attn_k_w": _kaiming(nxt(), (L, d, d), d),
        "attn_v_w": _kaiming(nxt(), (L, d, d), d), "attn_v_b": _bias_uniform(nxt(), (L, d), d),
        "attn_o_w": _kaiming(nxt(), (L, d, d), d), "attn_o_b": _bias_uniform(nxt(), (L, d), d),
        "mlp_ln_g": jnp.ones((L, d)), "mlp_ln_b": jnp.zeros((L, d)),
        "mlp_w1": _kaiming(nxt(), (L, d, 4 * d), d), "mlp_b1": _bias_uniform(nxt(), (L, 4 * d), d),
        "mlp_w2": _kaiming(nxt(), (L, 4 * d, d), 4 * d), "mlp_b2": _bias_uniform(nxt(), (L, d), 4 * d),
    }
    if cross:
        p.update({
            "cross_ln_g": jnp.ones((L, d)), "cross_ln_b": jnp.zeros((L, d)),
            "cross_q_w": _kaiming(nxt(), (L, d, d), d), "cross_q_b": _bias_uniform(nxt(), (L, d), d),
            "cross_k_w": _kaiming(nxt(), (L, d, d), d),
            "cross_v_w": _kaiming(nxt(), (L, d, d), d), "cross_v_b": _bias_uniform(nxt(), (L, d), d),
            "cross_o_w": _kaiming(nxt(), (L, d, d), d), "cross_o_b": _bias_uniform(nxt(), (L, d), d),
        })
    return p


def init_params(
    key: jax.Array,
    dims: ModelDimensions,
    include_padding_token: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Random-init parameters.

    ``include_padding_token=True`` adds the extra embedding row (id 51864) the
    training model carries (``model.py:660-667``); inference checkpoints strip
    it (``scripts/eval/gen_inf_ckpt.py:4-11``).
    """
    ke, kd, k1, k2, k3, k4, k5 = jax.random.split(key, 7)
    d = dims.n_audio_state
    dt = dims.n_text_state
    n_vocab = dims.n_vocab + (1 if include_padding_token else 0)

    conv1_fan = dims.n_mels * 3
    conv2_fan = d * 3
    kc1, kc1b, kc2, kc2b = jax.random.split(ke, 4)
    encoder: Params = {
        # conv kernels in (width, in, out) layout for lax.conv_general_dilated
        "conv1_w": _kaiming(kc1, (3, dims.n_mels, d), conv1_fan),
        "conv1_b": _bias_uniform(kc1b, (d,), conv1_fan),
        "conv2_w": _kaiming(kc2, (3, d, d), conv2_fan),
        "conv2_b": _bias_uniform(kc2b, (d,), conv2_fan),
        "blocks": _init_block_stack(k1, dims.n_audio_layer, d, cross=False),
        "ln_post_g": jnp.ones((d,)), "ln_post_b": jnp.zeros((d,)),
    }

    tok_emb = _kaiming(k2, (n_vocab, dt), dt)
    if include_padding_token:
        tok_emb = tok_emb.at[PADDING_TOKEN].set(0.0)  # padding_idx row zeroed
    decoder: Params = {
        "token_embedding": tok_emb,
        "positional_embedding": _kaiming(k3, (dims.n_text_ctx, dt), dt),
        "blocks": _init_block_stack(k4, dims.n_text_layer, dt, cross=True),
        "ln_g": jnp.ones((dt,)), "ln_b": jnp.zeros((dt,)),
    }
    params = {"encoder": encoder, "decoder": decoder}
    if dtype != jnp.float32:
        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return params


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    """Sinusoidal position embedding (model.py:199-230); a constant, not a param."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# core ops
# ---------------------------------------------------------------------------


def layer_norm(x: jax.Array, g: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    """fp32 LayerNorm island, result cast back to x.dtype (model.py:39)."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(orig_dtype)


def _split_heads(x: jax.Array, n_head: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def sdpa(
    q: jax.Array,  # (B, Tq, D)
    k: jax.Array,  # (B, Tk, D)
    v: jax.Array,  # (B, Tk, D)
    n_head: int,
    mask: Optional[jax.Array] = None,  # additive, broadcastable to (B, H, Tq, Tk)
    key_bias: Optional[jax.Array] = None,  # additive per-key (B, Tk)
) -> jax.Array:
    """Scaled dot-product attention with whisper's d_head**-0.25 q/k scaling and
    fp32 softmax (model.py:330-340, 423-433). XLA fuses this well; a Pallas
    flash-attention path in ``olmoasr_tpu.ops.attention`` replaces it on TPU for
    long sequences.

    ``key_bias`` carries the per-sample pad-column mask (reference
    model.py:684-686) as a (B, Tk) vector: both small additive operands fuse
    into the softmax fusion, so no (B, H, Tq, Tk) mask tensor ever sits in
    HBM (the materialized form measured ~100MB of per-layer reads at
    medium.en micro_bs=8)."""
    d_head = q.shape[-1] // n_head
    scale = d_head ** -0.25
    qh = _split_heads(q, n_head) * scale  # (B,Tq,H,Dh)
    kh = _split_heads(k, n_head) * scale
    vh = _split_heads(v, n_head)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    if key_bias is not None:
        logits = logits + key_bias.astype(jnp.float32)[:, None, None, :]
    w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
    return out.reshape(q.shape)


def _linear(x, w, b=None):
    y = x @ w.astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _block_apply(
    lp: Params,  # one layer's params (no leading L axis)
    x: jax.Array,
    n_head: int,
    mask: Optional[jax.Array],
    xa_kv: Optional[Tuple[jax.Array, jax.Array]] = None,  # precomputed cross k/v
    self_kv: Optional[Tuple[jax.Array, jax.Array]] = None,  # cache for self-attn
    key_bias: Optional[jax.Array] = None,  # (B, T) pad-column bias
) -> jax.Array:
    """One residual attention block (model.py:445-529)."""
    h = layer_norm(x, lp["attn_ln_g"], lp["attn_ln_b"])
    q = _tag_proj(_linear(h, lp["attn_q_w"], lp["attn_q_b"]))
    if self_kv is None:
        k = _tag_proj(_linear(h, lp["attn_k_w"]))
        v = _tag_proj(_linear(h, lp["attn_v_w"], lp["attn_v_b"]))
    else:
        k, v = self_kv
    x = _tag_resid(x + _linear(
        _tag_attn(sdpa(q, k, v, n_head, mask, key_bias)),
        lp["attn_o_w"], lp["attn_o_b"],
    ))

    if xa_kv is not None:
        h = layer_norm(x, lp["cross_ln_g"], lp["cross_ln_b"])
        q = _tag_proj(_linear(h, lp["cross_q_w"], lp["cross_q_b"]))
        ck, cv = xa_kv
        x = _tag_resid(x + _linear(
            _tag_attn(sdpa(q, ck, cv, n_head, None)),
            lp["cross_o_w"], lp["cross_o_b"],
        ))

    h = layer_norm(x, lp["mlp_ln_g"], lp["mlp_ln_b"])
    h = _linear(h, lp["mlp_w1"], lp["mlp_b1"])
    h = _mlp_act(h)
    x = x + _linear(h, lp["mlp_w2"], lp["mlp_b2"])
    return x


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _enc_pos_embedding(n_ctx: int, n_state: int) -> np.ndarray:
    # cache the numpy constant only — caching a jnp array here would leak a
    # tracer when first materialized inside a jit trace
    return sinusoids(n_ctx, n_state)


def _remat(fn, remat: bool, stack: str = ""):
    """Per-block rematerialization with a tunable policy.

    ``stack`` ("enc"/"dec") lets OLMOASR_REMAT_POLICY_ENC /
    OLMOASR_REMAT_POLICY_DEC override the global policy per layer stack —
    the gelu stash of ``mlp`` costs (B, T, 4D) per layer, 3.4x more for the
    1536-position encoder than the 448-position decoder, so mixed policies
    buy recompute savings where the memory price is low.

    OLMOASR_REMAT_POLICY= attn (default: save the per-block attention
    outputs — tagged ``attn_out`` below — so the remat recompute skips
    re-running attention, the costliest and most HBM-heavy part of the block
    forward; costs (B, T, D) per layer; measured 4882 vs 4810 tok/s on
    medium.en, perf/r2_train_flash5.log) | full (recompute everything, min
    memory) | dots (save matmul outputs — OOMs on medium.en even at
    micro_bs=4: it pins the stacked (24, B, H, 448, 1500) decoder attention
    probabilities, ~2.6GB) | wide (save attn + all q/k/v/cross projections —
    fits, but measured 4807 vs 4865 tok/s at micro_bs=8: the extra HBM
    writes/reads of saved projections offset the skipped recompute) | none.
    Also measured: micro_bs=16 4712 (weight traffic is not the bound) and
    pre-casting the f32 params to bf16 outside the scans 0.99x
    (perf/probe_castedweights.py — XLA already hoists the cast).
    """
    if not remat:
        return fn
    policy_name = os.environ.get("OLMOASR_REMAT_POLICY", "attn")
    if stack:
        policy_name = os.environ.get(
            f"OLMOASR_REMAT_POLICY_{stack.upper()}", policy_name
        )
    if policy_name == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_saveable
        )
    if policy_name == "attn":
        return jax.checkpoint(
            fn,
            policy=jax.checkpoint_policies.save_only_these_names("attn_out"),
        )
    if policy_name == "wide":
        # attn outputs + all q/k/v/cross projections: the bwd recompute skips
        # every projection matmul and re-derives only LNs + attention probs +
        # the MLP. Unlike ``dots`` this does NOT save the (T, 1500)/(T, T)
        # attention probability matrices (the 2.6GB that OOMed dots) nor the
        # 4096-wide MLP activations.
        return jax.checkpoint(
            fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out", "proj_out", "ckv"
            ),
        )
    if policy_name == "mlp":
        # attn outputs + the 4096-wide gelu activation: the recompute drops
        # the MLP (16Td^2 of the ~38Td^2+4T^2d recomputed under ``attn``),
        # the single largest recompute term, at (B, T, 4*D) bf16 per layer of
        # extra stash (medium.en micro_bs=8: 98MB x 24 enc layers = 2.4GB).
        # OLMOASR_SAVE_CKV / OLMOASR_SAVE_RESID extend the save list with the
        # decoder cross k/v projections / post-attention residual sums (see
        # _tag_ckv/_tag_resid); A/B'd on chip, docs/TRAIN_PERF.md.
        names = ["attn_out", "mlp_h"]
        if os.environ.get("OLMOASR_SAVE_CKV", "0") == "1":
            names.append("ckv")
        if os.environ.get("OLMOASR_SAVE_RESID", "0") == "1":
            names.append("resid2")
        return jax.checkpoint(
            fn,
            policy=jax.checkpoint_policies.save_only_these_names(*names),
        )
    if policy_name == "mlp_wide":
        return jax.checkpoint(
            fn,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out", "proj_out", "ckv", "mlp_h"
            ),
        )
    return jax.checkpoint(fn)


def _scan_unroll() -> int:
    """Unroll factor for the training layer scans (OLMOASR_SCAN_UNROLL).

    ``lax.scan`` over stacked layers compiles once but serializes weight DMA
    against compute at every iteration boundary; a small unroll lets XLA
    prefetch the next layer's weight slices during the current layer's
    matmuls. 1 = plain scan (default)."""
    return int(os.environ.get("OLMOASR_SCAN_UNROLL", "1"))


@jax.custom_vjp
def _grad_barrier_impl(p):
    return p


def _gb_fwd(p):
    return p, None


def _gb_bwd(_, g):
    return (jax.lax.optimization_barrier(g),)


_grad_barrier_impl.defvjp(_gb_fwd, _gb_bwd)


def _dw_barrier(lp):
    """Optimization-barrier the per-layer weight cotangents (OLMOASR_DW_BARRIER).

    The layer scans' backward accumulates each layer's dW into the stacked
    (n_layer, ...) gradient buffers with a dynamic-update-slice; XLA fuses the
    dW matmul INTO that DUS (bitcast_dynamic-update-slice_fusion) and the fused
    matmul runs at ~44 TF/s vs ~76 standalone (perf/r3_probe_dw1.log,
    perf/r3_profile_train2.log ~3% of leaf time). Barriering the cotangent
    forces dW to materialize at full matmul efficiency and degrades the DUS to
    a plain slice write. Identity in the forward pass; no effect on values."""
    if os.environ.get("OLMOASR_DW_BARRIER", "0") != "1":
        return lp
    return _grad_barrier_impl(lp)


def _tag_attn(x: jax.Array) -> jax.Array:
    """Name attention outputs for the selective ``attn`` remat policy."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "attn_out")


def _tag_proj(x: jax.Array) -> jax.Array:
    """Name q/k/v/cross projection outputs for the ``wide`` remat policy."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "proj_out")


def _mlp_act(h: jax.Array) -> jax.Array:
    """gelu with the remat stash tag (``mlp_h``) placed pre- or post-gelu.

    "pre" (default) saves the PRE-activation instead of the post-gelu
    value — same (B, T, 4*D) stash. The bwd recompute then derives both
    gelu' and the post-gelu value elementwise (VPU) from the stash,
    skipping the 8Td^2 W1-matmul recompute the post-gelu tag still pays
    (post-gelu alone cannot reconstruct gelu', so XLA re-runs x@W1 to get
    the pre-activation). Measured +0.45% on chip, both repeats winning
    outside the ±0.1% band (7246/7253 vs 7210/7223 tok/s,
    perf/r4_sweep10.log); see docs/TRAIN_PERF.md.
    """
    if os.environ.get("OLMOASR_MLP_TAG", "pre") == "pre":
        return jax.nn.gelu(_tag_mlp(h), approximate=False)
    return _tag_mlp(jax.nn.gelu(h, approximate=False))


def _tag_ckv(x: jax.Array) -> jax.Array:
    """Tag the decoder's per-layer cross k/v projections (``ckv``).

    These are projections of the SAME (B, Ta, D) audio features in every
    layer — ~28% of a decoder layer's forward flops — and the ``mlp``
    remat policy re-runs both in the bwd recompute. OLMOASR_SAVE_CKV=1
    adds them to the save list ((B, Ta, D) bf16 x2 per layer of stash)."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "ckv")


def _tag_resid(x: jax.Array) -> jax.Array:
    """Tag the post-attention residual sums (``resid2``).

    Saving them lets the bwd recompute skip the o-projection matmul that
    rebuilds the input of the next LN. OLMOASR_SAVE_RESID=1 adds them to
    the save list ((B, T, D) per attention sub-block of stash)."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "resid2")


def _tag_mlp(x: jax.Array) -> jax.Array:
    """Name the gelu activation for the ``mlp`` remat policy."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "mlp_h")


def encode_audio(
    params: Params,
    dims: ModelDimensions,
    mel: jax.Array,  # (B, n_mels, 3000)
    *,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    flash: Optional[bool] = None,
) -> jax.Array:
    """AudioEncoder forward (model.py:531-624): conv stem -> +sinusoids -> blocks -> LN.

    ``flash``: force the Pallas flash-attention kernel on (True) / off (False);
    None = batch heuristic (inference-tuned). Training passes True on TPU —
    the kernel's custom VJP never materializes the (B, H, 1500, 1500) scores,
    which is what capped micro_batch_size at 8 under remat.
    """
    enc = params["encoder"]
    x = mel.astype(compute_dtype)

    def conv1d(x, w, b, stride):
        # x: (B, C, T) -> conv over T with SAME padding 1, kernel 3
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(stride,),
            padding=[(1, 1)],
            dimension_numbers=("NCH", "HIO", "NCH"),
        )
        return y + b.astype(x.dtype)[None, :, None]

    x = jax.nn.gelu(conv1d(x, enc["conv1_w"], enc["conv1_b"], 1), approximate=False)
    x = jax.nn.gelu(conv1d(x, enc["conv2_w"], enc["conv2_b"], 2), approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T=1500, D)

    pos = jnp.asarray(_enc_pos_embedding(dims.n_audio_ctx, dims.n_audio_state))
    x = (x + pos.astype(x.dtype)).astype(x.dtype)

    # Flash attention for the 1500-position self-attention. Batch-dependent:
    # at B=32 XLA's fused attention wins (r1 measured flash ~2x slower), but
    # at B>=64 flash wins (B=128: 980.6 vs 962 RTFx end-to-end,
    # perf/r2_ab6.log) — the bigger grid amortizes its block overheads.
    # OLMOASR_FLASH=1/0 overrides the batch heuristic either way.
    flash_env = os.environ.get("OLMOASR_FLASH", "")
    if flash is None:
        use_flash = flash_env == "1" or (flash_env != "0" and mel.shape[0] >= 64)
    else:
        use_flash = flash
    use_flash = use_flash and jax.default_backend() == "tpu"

    # OLMOASR_ENC_ATTN=kernel routes the specialized one-pass training kernel
    # (ops/train_attention.py: fused single-pass bwd, residuals=(q,k,v) so
    # remat never re-runs the forward) instead of the generic flash kernel
    use_kernel = (
        use_flash and os.environ.get("OLMOASR_ENC_ATTN", "kernel") == "kernel"
    )

    # kernel path: run the WHOLE layer stack pre-padded to a 128-multiple
    # (1500 -> 1536) so the attention kernel never re-pads q/k/v per layer —
    # those pad/unpad HBM copies dominated the leaf copy traffic
    # (perf/r3_profile_train2.log). Padded positions are bias-masked as keys
    # in every layer, so no valid position ever reads them; their activations
    # are garbage-but-isolated and sliced off before ln_post.
    T_valid = x.shape[1]
    if use_kernel:
        # (a 16-multiple pad — 1500 -> 1504, saving ~2.1% encoder flops —
        # was measured a big NEGATIVE, 5868 vs 7220 tok/s, perf/r4_sweep9.log:
        # the kernels then re-pad k/v to the 128-multiple key length every
        # layer, re-creating the per-layer pad copies the pre-padded stack
        # kills. 128-multiple pre-pad is settled; see docs/TRAIN_PERF.md.)
        T_pad = ((T_valid + 127) // 128) * 128
        if T_pad != T_valid:
            x = jnp.pad(x, ((0, 0), (0, T_pad - T_valid), (0, 0)))

    def attn_fn(q, k, v):
        if use_kernel:
            from olmoasr_tpu.ops.train_attention import enc_self_attention

            return enc_self_attention(
                q, k, v, dims.n_audio_head, valid_len=T_valid
            )
        if use_flash:
            from olmoasr_tpu.ops.flash import flash_self_attention

            return flash_self_attention(q, k, v, dims.n_audio_head)
        return sdpa(q, k, v, dims.n_audio_head, None)

    def block_fn(x, lp):
        lp = _dw_barrier(lp)
        h = layer_norm(x, lp["attn_ln_g"], lp["attn_ln_b"])
        q = _tag_proj(_linear(h, lp["attn_q_w"], lp["attn_q_b"]))
        k = _tag_proj(_linear(h, lp["attn_k_w"]))
        v = _tag_proj(_linear(h, lp["attn_v_w"], lp["attn_v_b"]))
        x = _tag_resid(
            x + _linear(_tag_attn(attn_fn(q, k, v)), lp["attn_o_w"], lp["attn_o_b"])
        )
        h = layer_norm(x, lp["mlp_ln_g"], lp["mlp_ln_b"])
        h = _linear(h, lp["mlp_w1"], lp["mlp_b1"])
        h = _mlp_act(h)
        x = x + _linear(h, lp["mlp_w2"], lp["mlp_b2"])
        return x, None

    f = _remat(block_fn, remat, stack="enc")
    x, _ = jax.lax.scan(f, x, enc["blocks"], unroll=_scan_unroll())
    if use_kernel and x.shape[1] != T_valid:
        x = x[:, :T_valid]
    return layer_norm(x, enc["ln_post_g"], enc["ln_post_b"])


# ---------------------------------------------------------------------------
# decoder: full-sequence (training) forward
# ---------------------------------------------------------------------------


def decode_train(
    params: Params,
    dims: ModelDimensions,
    tokens: jax.Array,  # (B, T) int32; may contain PADDING_TOKEN
    audio_features: jax.Array,  # (B, 1500, D)
    padding_mask: Optional[jax.Array] = None,  # additive (B, T) per-key bias, or (B, T, T)/(B,1,T,T)
    *,
    remat: bool = False,
    flash: Optional[bool] = None,
    return_hidden: bool = False,
) -> jax.Array:
    """TextDecoder training forward (model.py:626-776): causal (+padding) mask,
    full-sequence attention, logits through tied embedding in fp32.

    ``flash=True`` (TPU only) runs self- and cross-attention through the
    Pallas flash kernel: causal handled natively, the additive padding-column
    mask re-expressed as segment ids (valid tokens id 0, pads id 1 — exactly
    the reference's -inf pad columns, model.py:684-686), so the (B, H, T, T)
    and (B, H, T, 1500) score tensors never hit HBM.
    """
    dec = params["decoder"]
    T = tokens.shape[1]
    dtype = audio_features.dtype
    n_head = dims.n_text_head

    x = dec["token_embedding"][tokens].astype(dtype)
    x = x + dec["positional_embedding"][:T].astype(dtype)

    # decoder flash measured SLOWER on v5e (perf/r2_train_flash3.log: enc+dec
    # 867ms at bwd_block=256 vs enc-only 710) — the 448-query/1536-key shapes
    # are too small to amortize the kernel; default off, env-gated for retune.
    use_flash = (
        bool(flash)
        and jax.default_backend() == "tpu"
        and os.environ.get("OLMOASR_TRAIN_FLASH_DEC", "0") == "1"
    )

    causal = jnp.triu(jnp.full((T, T), -jnp.inf, dtype=jnp.float32), k=1)
    key_bias = None
    if padding_mask is not None and padding_mask.ndim == 2:
        # compact (B, T) per-key pad bias — the loader's native form; stays a
        # vector all the way into the softmax fusion (see sdpa.key_bias)
        key_bias = padding_mask.astype(jnp.float32)
        mask = causal[None, None]
    elif padding_mask is not None:
        if padding_mask.ndim == 3:
            padding_mask = padding_mask[:, None]  # (B,1,T,T)
        mask = padding_mask.astype(jnp.float32) + causal
    else:
        mask = causal[None, None]

    if use_flash:
        from olmoasr_tpu.ops.flash import flash_mha

        # per-sample key validity from the additive mask's suffix-pad columns
        # (dataset.py: mask[n:] = -inf, one bias per key column)
        if key_bias is not None:
            ids = (key_bias != 0).astype(jnp.int32)  # (B,T)
        elif padding_mask is not None:
            ids = (padding_mask[:, 0, 0, :] != 0).astype(jnp.int32)  # (B,T)
        else:
            ids = jnp.zeros(tokens.shape, jnp.int32)

        def self_attn(q, k, v):
            return flash_mha(q, k, v, n_head, causal=True, q_ids=ids, kv_ids=ids)

        def cross_attn(q, ck, cv):
            # no mask in reference cross-attention: every text position
            # attends the full 1500 audio positions
            return flash_mha(q, ck, cv, n_head)

    # OLMOASR_DEC_ATTN=kernel routes decoder self/cross attention through the
    # specialized training kernels (ops/train_attention.py) — requires the
    # loader's compact (B, T) key bias (or no mask); legacy (B, T, T) masks
    # fall back to XLA attention. =kernel_interpret runs the same kernels in
    # Pallas interpret mode on any backend (CPU equivalence tests).
    _dec_attn = os.environ.get("OLMOASR_DEC_ATTN", "kernel")
    kernel_interpret = _dec_attn == "kernel_interpret"
    use_kernel = (
        kernel_interpret
        or (_dec_attn == "kernel" and jax.default_backend() == "tpu")
    ) and (padding_mask is None or key_bias is not None)
    if use_kernel:
        from olmoasr_tpu.ops.train_attention import (
            cross_attention as k_cross,
            dec_self_attention as k_self,
        )

        kb = key_bias  # None -> shared static pad bias only (Bb=1 fast path)
        # pad the audio features ONCE to a 128-multiple: the per-layer cross
        # k/v projections then produce pre-aligned tensors and the cross
        # kernel never pads/unpads (B, 1500, D)-sized operands per layer
        # (the pad positions are bias-masked keys via valid_len)
        Ta_valid = audio_features.shape[1]
        Ta_pad = ((Ta_valid + 127) // 128) * 128
        if Ta_pad != Ta_valid:
            audio_features = jnp.pad(
                audio_features, ((0, 0), (0, Ta_pad - Ta_valid), (0, 0))
            )

        def kernel_block(x, lp, ck, cv):
            h = layer_norm(x, lp["attn_ln_g"], lp["attn_ln_b"])
            q = _tag_proj(_linear(h, lp["attn_q_w"], lp["attn_q_b"]))
            sk = _tag_proj(_linear(h, lp["attn_k_w"]))
            sv = _tag_proj(_linear(h, lp["attn_v_w"], lp["attn_v_b"]))
            x = _tag_resid(x + _linear(
                _tag_attn(
                    k_self(
                        q, sk, sv, n_head, key_bias=kb,
                        interpret=kernel_interpret,
                    )
                ),
                lp["attn_o_w"], lp["attn_o_b"],
            ))
            h = layer_norm(x, lp["cross_ln_g"], lp["cross_ln_b"])
            q = _tag_proj(_linear(h, lp["cross_q_w"], lp["cross_q_b"]))
            x = _tag_resid(x + _linear(
                _tag_attn(
                    k_cross(
                        q, ck, cv, n_head, interpret=kernel_interpret,
                        valid_len=Ta_valid,
                    )
                ),
                lp["cross_o_w"], lp["cross_o_b"],
            ))
            h = layer_norm(x, lp["mlp_ln_g"], lp["mlp_ln_b"])
            h = _linear(h, lp["mlp_w1"], lp["mlp_b1"])
            h = _mlp_act(h)
            x = x + _linear(h, lp["mlp_w2"], lp["mlp_b2"])
            return x

    # cross k/v are per-layer projections of the same audio features; computing
    # them inside the scan keeps memory low and lets XLA overlap with attention.
    def block_fn(x, lp):
        lp = _dw_barrier(lp)
        ck = _tag_ckv(_linear(audio_features, lp["cross_k_w"]))
        cv = _tag_ckv(_linear(audio_features, lp["cross_v_w"], lp["cross_v_b"]))
        if use_kernel:
            return kernel_block(x, lp, ck, cv), None
        if not use_flash:
            return _block_apply(
                lp, x, n_head, mask, xa_kv=(ck, cv), key_bias=key_bias
            ), None
        h = layer_norm(x, lp["attn_ln_g"], lp["attn_ln_b"])
        q = _tag_proj(_linear(h, lp["attn_q_w"], lp["attn_q_b"]))
        k = _tag_proj(_linear(h, lp["attn_k_w"]))
        v = _tag_proj(_linear(h, lp["attn_v_w"], lp["attn_v_b"]))
        x = _tag_resid(x + _linear(
            _tag_attn(self_attn(q, k, v)), lp["attn_o_w"], lp["attn_o_b"]
        ))
        h = layer_norm(x, lp["cross_ln_g"], lp["cross_ln_b"])
        q = _tag_proj(_linear(h, lp["cross_q_w"], lp["cross_q_b"]))
        x = _tag_resid(x + _linear(
            _tag_attn(cross_attn(q, ck, cv)), lp["cross_o_w"], lp["cross_o_b"]
        ))
        h = layer_norm(x, lp["mlp_ln_g"], lp["mlp_ln_b"])
        h = _linear(h, lp["mlp_w1"], lp["mlp_b1"])
        h = _mlp_act(h)
        x = x + _linear(h, lp["mlp_w2"], lp["mlp_b2"])
        return x, None

    f = _remat(block_fn, remat, stack="dec")
    x, _ = jax.lax.scan(f, x, dec["blocks"], unroll=_scan_unroll())
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    if return_hidden:
        return x
    logits = (x @ dec["token_embedding"].astype(x.dtype).T).astype(jnp.float32)
    return logits


def forward_train(
    params: Params,
    dims: ModelDimensions,
    mel: jax.Array,
    tokens: jax.Array,
    padding_mask: Optional[jax.Array] = None,
    *,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    flash: Optional[bool] = None,
    return_hidden: bool = False,
) -> jax.Array:
    """Full training forward: mel -> encoder -> decoder -> logits
    (OLMoASR.forward, model.py:778-923). ``return_hidden`` stops before the
    tied-embedding logits matmul (for the chunked-vocab CE in training — the
    (B, T, 51865) fp32 logits tensor never materializes)."""
    audio = encode_audio(
        params, dims, mel, compute_dtype=compute_dtype, remat=remat, flash=flash
    )
    return decode_train(
        params, dims, tokens, audio, padding_mask, remat=remat, flash=flash,
        return_hidden=return_hidden,
    )


# ---------------------------------------------------------------------------
# decoder: KV-cached incremental inference
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Explicit decoder state (replaces inf_model.py's forward hooks).

    self_k/self_v: (L, B, n_ctx, D) preallocated rings; ``index`` is the count
    of valid positions. cross_k/cross_v: (L, B, 1500, D) computed once per
    audio window — cross_k is stored TRANSPOSED (L, B, D, 1500) on TPU when
    int8-quantized (see init_cache: the decode kernel's (H, T)-oriented q.K
    dot), detected downstream by shape against cross_v.

    Optional int8 quantization of the cross k/v (the decode loop's dominant
    HBM traffic — read in full by every layer at every step): values stored
    int8 with per-(layer, batch, position) scales. The scales factor out of
    both attention dots (s_t is constant along the contracted feature axis),
    so dequantized tensors never materialize:
        logits[.., t] = (q @ k_int8^T)[.., t] * ks[t]
        out = (w * vs) @ v_int8
    """

    self_k: jax.Array  # bf16/f32, or int8 when quantize_self
    self_v: jax.Array
    cross_k: jax.Array  # bf16/f32, or int8 when quantized
    cross_v: jax.Array
    index: jax.Array  # scalar int32
    cross_k_scale: Optional[jax.Array] = None  # (L, B, 1, 1500) f32 when int8
    cross_v_scale: Optional[jax.Array] = None  # (stored 4-D: the kernel's
    # block layout — a per-step (L,B,T)->(L,B,1,T) reshape cost 0.8ms at B=128)
    self_k_scale: Optional[jax.Array] = None  # (L, B, 1, C) f32 when int8
    self_v_scale: Optional[jax.Array] = None


def _quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row (last-axis) symmetric int8 quantization."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def init_cache(
    params: Params,
    dims: ModelDimensions,
    audio_features: jax.Array,  # (B, 1500, D)
    max_len: Optional[int] = None,
    *,
    quantize_cross: bool = False,
    quantize_self: bool = False,
    self_batch: Optional[int] = None,
) -> KVCache:
    """Allocate the cache and precompute per-layer cross-attention k/v.

    ``self_batch`` sizes the self-attention rings independently of the cross
    cache: beam search / best_of sampling decode ``self_batch = B * K`` token
    rows that all attend over the SAME ``B`` audio windows — storing the cross
    K/V once per window (not per beam) cuts the decode loop's dominant HBM
    traffic by K (the reference replicates per beam; eval.py beam_size=5).
    decode_step derives the group factor from the row-count ratio.
    """
    dec = params["decoder"]
    L = dims.n_text_layer
    B = audio_features.shape[0]
    sb = self_batch or B
    assert sb % B == 0, "self_batch must be a multiple of the audio batch"
    D = dims.n_text_state
    n_ctx = max_len or dims.n_text_ctx
    dtype = audio_features.dtype

    def cross_proj(lp):
        ck = _linear(audio_features, lp["cross_k_w"])
        cv = _linear(audio_features, lp["cross_v_w"], lp["cross_v_b"])
        return ck, cv

    cross_k, cross_v = jax.vmap(cross_proj)(dec["blocks"])  # (L, B, 1500, D)
    ck_scale = cv_scale = None
    if quantize_cross:
        cross_k, ck_scale = _quantize_rows(cross_k)
        cross_v, cv_scale = _quantize_rows(cross_v)
        ck_scale = ck_scale[:, :, None, :]  # (L, B, 1, T): kernel block layout
        cv_scale = cv_scale[:, :, None, :]
        # Transposed-K layout (L, B, D, T): the decode kernel's q.K dot runs
        # in the (H, T) orientation with T on the 128 MXU/VPU lanes instead
        # of H=12 padded to 128 — ~10x fewer wasted lanes on the dot, the
        # scale multiplies, and the softmax. K is written once here and read
        # every step, so the transpose is amortized 224x. Layout is detected
        # downstream by shape (guarded against T == D here).
        if (
            jax.default_backend() == "tpu"
            and os.environ.get("OLMOASR_CROSS_KT", "1") == "1"
            and cross_k.shape[2] != cross_k.shape[3]
        ):
            cross_k = cross_k.transpose(0, 1, 3, 2)
    # (a head-interleaved V twin that replaced the kernel's expand dot with
    # pltpu.repeat was a settled NEGATIVE — Mosaic lowers the lane tile as a
    # slow relayout, 695 vs 947 RTFx at B=64 — and was removed in r5)
    self_dtype = jnp.int8 if quantize_self else dtype
    sk_scale = sv_scale = None
    if quantize_self:
        sk_scale = jnp.zeros((L, sb, 1, n_ctx), jnp.float32)
        sv_scale = jnp.zeros((L, sb, 1, n_ctx), jnp.float32)
    return KVCache(
        self_k=jnp.zeros((L, sb, n_ctx, D), self_dtype),
        self_v=jnp.zeros((L, sb, n_ctx, D), self_dtype),
        cross_k=cross_k,
        cross_v=cross_v,
        index=jnp.zeros((), jnp.int32),
        cross_k_scale=ck_scale,
        cross_v_scale=cv_scale,
        self_k_scale=sk_scale,
        self_v_scale=sv_scale,
    )


def _attend_cached(
    q: jax.Array,  # (B, S, D)
    k_old: jax.Array,  # (B, C, D) — preallocated ring, only pos < offset valid
    v_old: jax.Array,
    k_new: jax.Array,  # (B, S, D) — this call's keys (positions offset..offset+S-1)
    v_new: jax.Array,
    offset: jax.Array,  # scalar
    n_head: int,
) -> jax.Array:
    """Self-attention against old-cache + new keys WITHOUT re-reading the
    updated cache. Keeping the ring read-only inside the layer scan lets XLA
    alias it (no per-step full-cache rewrite — measured 5.4ms/step -> ~1ms on
    v5e for small.en B=32); the new (L, B, S, D) slice is written into the
    cache once per step, outside the scan."""
    B, S, D = q.shape
    C = k_old.shape[1]
    d_head = D // n_head
    scale = d_head ** -0.25
    qh = _split_heads(q, n_head) * scale
    koh = _split_heads(k_old, n_head) * scale
    knh = _split_heads(k_new, n_head) * scale

    logits_old = jnp.einsum("bqhd,bkhd->bhqk", qh, koh).astype(jnp.float32)
    k_pos = jnp.arange(C)[None, None, None, :]
    logits_old = jnp.where(k_pos < offset, logits_old, -jnp.inf)
    logits_new = jnp.einsum("bqhd,bkhd->bhqk", qh, knh).astype(jnp.float32)
    causal = jnp.tril(jnp.ones((S, S), bool))[None, None]
    logits_new = jnp.where(causal, logits_new, -jnp.inf)

    logits = jnp.concatenate([logits_old, logits_new], axis=-1)
    w = jax.nn.softmax(logits, axis=-1)
    voh = _split_heads(v_old, n_head)
    vnh = _split_heads(v_new, n_head)
    out = jnp.einsum("bhqk,bkhd->bqhd", w[..., :C].astype(voh.dtype), voh)
    out = out + jnp.einsum("bhqk,bkhd->bqhd", w[..., C:].astype(vnh.dtype), vnh)
    return out.reshape(q.shape)


def cross_attend(
    q: jax.Array,  # (B, S, D)
    ck: jax.Array,  # (B, Tk, D) bf16 or int8 — or (B, D, Tk) if k_transposed
    cv: jax.Array,
    n_head: int,
    ck_scale: Optional[jax.Array] = None,  # (B, Tk) when int8
    cv_scale: Optional[jax.Array] = None,
    k_transposed: bool = False,
) -> jax.Array:
    """Cross attention supporting int8 K/V with factored-out scales and the
    transposed (B, D, Tk) key layout the decode kernel prefers (used here by
    the prefill / kernel-off paths; XLA contracts either layout natively)."""
    if ck_scale is None:
        return sdpa(q, ck, cv, n_head, None)
    if ck_scale.ndim == 3:  # cache stores (…, 1, Tk); accept either
        ck_scale = ck_scale[:, 0]
    if cv_scale.ndim == 3:
        cv_scale = cv_scale[:, 0]
    d_head = q.shape[-1] // n_head
    scale = d_head ** -0.25
    qh = _split_heads(q, n_head) * (scale * scale)  # fold both q,k scales into q
    vh = _split_heads(cv.astype(qh.dtype), n_head)
    if k_transposed:
        B, D, Tk = ck.shape
        kh = ck.reshape(B, n_head, d_head, Tk).astype(qh.dtype)
        logits = jnp.einsum("bqhd,bhdk->bhqk", qh, kh).astype(jnp.float32)
    else:
        kh = _split_heads(ck.astype(qh.dtype), n_head)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
    logits = logits * ck_scale[:, None, None, :].astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    # fold the v scale into the attention weights
    w = (w * cv_scale[:, None, None, :].astype(jnp.float32)).astype(vh.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
    return out.reshape(q.shape)


def decode_step(
    params: Params,
    dims: ModelDimensions,
    tokens: jax.Array,  # (B, S) — S=prompt len at prefill, 1 afterwards
    cache: KVCache,
    beam_anc: Optional[jax.Array] = None,  # (B, n_ctx) int32 — see below
) -> Tuple[jax.Array, KVCache]:
    """Run the decoder on ``tokens`` starting at position ``cache.index``.

    Returns logits (B, S, n_vocab) and the updated cache. Static shapes: the
    self-attention reads the full preallocated ring and masks invalid slots, so
    one compiled program serves every step (jit/scan friendly).

    ``beam_anc``: beam-search ancestry — the self rings are NOT physically
    reordered when beams are re-ranked; ``beam_anc[b, t]`` names the
    within-group ring row (0..kv_group-1) holding row b's kv history at
    position t. Requires a shared cross cache (kv_group > 1 via init_cache
    self_batch) and S == 1.
    """
    dec = params["decoder"]
    B, S = tokens.shape
    self_quant = cache.self_k_scale is not None
    # activation dtype: the ring dtype unless the rings are int8-quantized
    dtype = dec["token_embedding"].dtype if self_quant else cache.self_k.dtype
    n_ctx = cache.self_k.shape[2]
    offset = cache.index
    # transposed cross-K layout (L, B, D, T) — see init_cache; detected by
    # shape against cross_v (init_cache never transposes when T == D)
    ck_t = cache.cross_k.shape != cache.cross_v.shape
    # shared cross cache (see init_cache self_batch): kv_group token rows per
    # audio window, row b reads cross row b // kv_group (audio-major layout)
    kv_B = cache.cross_v.shape[1]
    assert B % kv_B == 0, f"token rows {B} not a multiple of audio rows {kv_B}"
    kv_group = B // kv_B
    if beam_anc is not None:
        assert S == 1 and kv_group > 1, "ancestry mode needs S=1, shared cross"

    x = dec["token_embedding"][tokens].astype(dtype)
    pos = jax.lax.dynamic_slice_in_dim(
        dec["positional_embedding"], offset, S, axis=0
    )
    x = x + pos.astype(dtype)

    on_tpu = jax.default_backend() == "tpu"
    use_pallas_cross = (
        S == 1 and on_tpu and os.environ.get("OLMOASR_PALLAS_CROSS", "0") == "1"
        and kv_group == 1  # standalone cross kernel has no shared-kv indexing
    )
    # fused cross sub-block megakernel (LN + q proj + int8 attention + out
    # proj + residual in ONE launch; streams int8 K/V bytes instead of the
    # XLA path's bf16-sized traffic)
    use_pallas_cross_block = (
        S == 1
        and on_tpu
        and os.environ.get("OLMOASR_PALLAS_CROSS_BLOCK", "1") == "1"
    )
    if use_pallas_cross_block:
        use_pallas_cross = False
    # pallas self-attention kernel: reads the FULL stacked rings with a
    # scalar-prefetch layer index, avoiding XLA's per-layer xs slice copies
    # (measured ~2.4ms/step -> ~0.3ms floor at B=32 small.en)
    use_pallas_self = (
        S == 1 and on_tpu and os.environ.get("OLMOASR_PALLAS_SELF", "1") == "1"
    )
    # fused LN+W1+gelu+W2+residual kernel (one launch instead of ~5/layer)
    use_pallas_mlp = (
        S == 1 and on_tpu and os.environ.get("OLMOASR_PALLAS_MLP", "1") == "1"
    )
    # whole decoder layer in ONE launch (self + cross + MLP;
    # ops/attention.py::layer_block_decode).
    # "1" fuses the whole layer (self+cross+MLP, one launch — 19.4M scoped
    # VMEM at small.en, over the 16M budget: OOMs; kept for D<768 models);
    # "sc" fuses self+cross (5 launches -> 2) and runs the MLP through
    # mlp_block, fitting small.en's weight budget. "sc" is the default:
    # measured 1451 vs 1441 RTFx at B=128 greedy (perf/r3_sweep4.log).
    # Beam/best_of (shared cross groups / ancestry rings) stays on the
    # split kernels: the beam-mode layer block needed 18.1M scoped VMEM at
    # batch 32 x beam 5 — over v5e's ~16M budget (perf/r3_beamlb_repro.log)
    # — and was deleted in r4 (VERDICT item: fit or delete).
    if os.environ.get("OLMOASR_LAYER_BLOCK_BEAM") is not None:
        warnings.warn(
            "OLMOASR_LAYER_BLOCK_BEAM has no effect: the beam-mode layer "
            "block was removed in r4 (18.1M scoped VMEM at batch 32 x beam 5 "
            "exceeded v5e's ~16M budget, perf/r3_beamlb_repro.log); beam "
            "decode always uses the split kernels.",
            stacklevel=2,
        )
    lb_mode = os.environ.get("OLMOASR_LAYER_BLOCK", "sc")
    use_layer_block = (
        S == 1
        and on_tpu
        and lb_mode in ("1", "sc")
        and not self_quant
        and ck_t
        and beam_anc is None
        and kv_group == 1
    )

    # fused q/k/v projection weights: one MXU matmul instead of three small
    # ones per layer. Scan-invariant, so XLA hoists the concat out of the
    # decode loop.
    D = dims.n_text_state
    blocks = dec["blocks"]
    qkv_w = jnp.concatenate(
        [blocks["attn_q_w"], blocks["attn_k_w"], blocks["attn_v_w"]], axis=-1
    )  # (L, D, 3D)
    qkv_b = jnp.concatenate(
        [blocks["attn_q_b"], jnp.zeros_like(blocks["attn_q_b"]), blocks["attn_v_b"]],
        axis=-1,
    )  # (L, 3D); the key projection has no bias (model.py:260)

    def block_fn(x, layer_state):
        # self_k/self_v rings are READ-ONLY here; the new k/v slices are
        # emitted as (tiny) ys and written into the cache once, after the scan
        # — rewriting the rings per layer forces XLA to copy the full cache
        # every step (measured 5.4 ms/step on v5e before this change).
        lp, wqkv, bqkv, sk, sv, sks, svs, ck, cv, cks, cvs, li = layer_state
        if lb_effective:
            from olmoasr_tpu.ops.attention import layer_block_decode, mlp_block

            nx, k_new, v_new = layer_block_decode(
                x, blocks["attn_ln_g"], blocks["attn_ln_b"], qkv_w, qkv_b,
                blocks["attn_o_w"], blocks["attn_o_b"],
                blocks["cross_ln_g"], blocks["cross_ln_b"],
                blocks["cross_q_w"], blocks["cross_q_b"],
                blocks["cross_o_w"], blocks["cross_o_b"],
                blocks["mlp_ln_g"], blocks["mlp_ln_b"], blocks["mlp_w1"],
                blocks["mlp_b1"], blocks["mlp_w2"], blocks["mlp_b2"],
                cache.self_k, cache.self_v, cache.cross_k, cache.cross_v,
                cross_ks, cross_vs, offset, li,
                n_head=dims.n_text_head,
                rows=int(os.environ.get("OLMOASR_LAYER_ROWS", "1")),
                wv_mode=os.environ.get("OLMOASR_WV_MODE", "dot"),
                include_mlp=lb_mode == "1",
            )
            if lb_mode == "sc":
                if use_pallas_mlp:
                    nx = mlp_block(
                        nx, blocks["mlp_ln_g"], blocks["mlp_ln_b"],
                        blocks["mlp_w1"], blocks["mlp_b1"], blocks["mlp_w2"],
                        blocks["mlp_b2"], li,
                    )
                else:  # honor OLMOASR_PALLAS_MLP=0 in sc mode (debug knob)
                    h = layer_norm(nx, lp["mlp_ln_g"], lp["mlp_ln_b"])
                    h = _linear(h, lp["mlp_w1"], lp["mlp_b1"])
                    h = jax.nn.gelu(h, approximate=False)
                    nx = nx + _linear(h, lp["mlp_w2"], lp["mlp_b2"])
            return nx.astype(dtype), (
                k_new.astype(dtype), v_new.astype(dtype)
            )
        if use_pallas_self:
            from olmoasr_tpu.ops.attention import (
                ln_matmul,
                matmul_residual,
                self_attend_decode,
            )

            # batched fused LN+QKV (one launch; same grid=(1,) pattern as
            # mlp_block). (The standalone fused self sub-block kernel that
            # used to sit here was retired in r3: 17.78M scoped VMEM at its
            # benched config — over the 16M budget — and strictly dominated
            # by the default self+cross layer block above.)
            qkv = ln_matmul(
                x, blocks["attn_ln_g"], blocks["attn_ln_b"], qkv_w, qkv_b,
                li,
            )
            q = qkv[..., :D]
            k_new = qkv[..., D : 2 * D]
            v_new = qkv[..., 2 * D :]
            # attention-only kernel over the full stacked rings
            attn = self_attend_decode(
                q, cache.self_k, cache.self_v, k_new, v_new, offset, li,
                cache.self_k_scale, cache.self_v_scale,
                n_head=dims.n_text_head,
                # rows=8 measured best at B=128 (1356 vs 1317 RTFx; 16
                # blows VMEM); falls back to 1 when B isn't divisible
                rows=int(os.environ.get("OLMOASR_SELF_ROWS", "8")),
                ht=os.environ.get("OLMOASR_SELF_HT", "0") == "1",
                beam_anc=beam_anc, beam_k=kv_group,
            ).astype(x.dtype)
            x = matmul_residual(
                attn, x, blocks["attn_o_w"], blocks["attn_o_b"], li
            )
            if not use_pallas_cross_block:
                qc = ln_matmul(
                    x, blocks["cross_ln_g"], blocks["cross_ln_b"],
                    blocks["cross_q_w"], blocks["cross_q_b"], li,
                )
        else:
            h = layer_norm(x, lp["attn_ln_g"], lp["attn_ln_b"])
            qkv = _linear(h, wqkv, bqkv)
            q = qkv[..., :D]
            k_new = qkv[..., D : 2 * D]
            v_new = qkv[..., 2 * D :]
            if self_quant:
                # dequantize the ring slices for the XLA path (prefill or
                # kernel-disabled); sks/svs are (B, 1, C) per-position scales
                sk = sk.astype(jnp.float32) * sks.transpose(0, 2, 1)
                sv = sv.astype(jnp.float32) * svs.transpose(0, 2, 1)
                sk = sk.astype(x.dtype)
                sv = sv.astype(x.dtype)
            if beam_anc is not None:
                # XLA form of the ancestry gather (CPU / kernel-off paths):
                # row b reads position t's kv from its group's ring row
                # beam_anc[b, t]
                g_rows = (
                    (jnp.arange(B) // kv_group * kv_group)[:, None] + beam_anc
                )
                sk = jnp.take_along_axis(sk, g_rows[:, :, None], axis=0)
                sv = jnp.take_along_axis(sv, g_rows[:, :, None], axis=0)
            attn = _attend_cached(
                q, sk, sv, k_new, v_new, offset, dims.n_text_head
            )
            x = x + _linear(attn, lp["attn_o_w"], lp["attn_o_b"])
            if not use_pallas_cross_block:
                qc = _linear(
                    layer_norm(x, lp["cross_ln_g"], lp["cross_ln_b"]),
                    lp["cross_q_w"], lp["cross_q_b"],
                )
        if use_pallas_cross_block:
            from olmoasr_tpu.ops.attention import cross_block_decode

            x = cross_block_decode(
                x, blocks["cross_ln_g"], blocks["cross_ln_b"],
                blocks["cross_q_w"], blocks["cross_q_b"],
                blocks["cross_o_w"], blocks["cross_o_b"],
                cache.cross_k, cache.cross_v, cross_ks, cross_vs, li,
                n_head=dims.n_text_head,
                wv_mode=os.environ.get("OLMOASR_WV_MODE", "dot"),
                k_transposed=ck_t,
                rows=int(os.environ.get("OLMOASR_CROSS_ROWS", "1")),
                kv_group=kv_group,
            )
        elif use_pallas_cross:
            from olmoasr_tpu.ops.attention import cross_attend_decode

            assert not ck_t, "cross_attend_decode takes the (B, T, D) layout"
            cattn = cross_attend_decode(
                qc, ck, cv, cks, cvs, n_head=dims.n_text_head
            ).astype(x.dtype)
        else:
            if kv_group > 1:
                # token rows sharing a cross row fold into the query sequence
                # dim (cross attention is position-independent per query), so
                # the shared K/V never replicate — used by beam/best_of
                # prefill and the kernel-off decode path
                qg = qc.reshape(kv_B, kv_group * S, D)
                cattn = cross_attend(
                    qg, ck, cv, dims.n_text_head, cks, cvs, k_transposed=ck_t
                ).reshape(B, S, D)
            else:
                cattn = cross_attend(
                    qc, ck, cv, dims.n_text_head, cks, cvs, k_transposed=ck_t
                )
        if use_pallas_cross_block:
            pass  # out proj + residual fused into cross_block_decode
        elif use_pallas_self:
            from olmoasr_tpu.ops.attention import matmul_residual

            x = matmul_residual(
                cattn.astype(x.dtype), x, blocks["cross_o_w"],
                blocks["cross_o_b"], li,
            )
        else:
            x = x + _linear(cattn, lp["cross_o_w"], lp["cross_o_b"])
        if use_pallas_mlp:
            from olmoasr_tpu.ops.attention import mlp_block

            x = mlp_block(
                x, blocks["mlp_ln_g"], blocks["mlp_ln_b"], blocks["mlp_w1"],
                blocks["mlp_b1"], blocks["mlp_w2"], blocks["mlp_b2"], li,
            ).astype(x.dtype)
        else:
            h = layer_norm(x, lp["mlp_ln_g"], lp["mlp_ln_b"])
            h = _linear(h, lp["mlp_w1"], lp["mlp_b1"])
            h = jax.nn.gelu(h, approximate=False)
            x = x + _linear(h, lp["mlp_w2"], lp["mlp_b2"])
        return x, (k_new, v_new)

    L = dims.n_text_layer
    lb_effective = use_layer_block
    cross_ks, cross_vs = cache.cross_k_scale, cache.cross_v_scale
    if (use_pallas_cross_block or lb_effective) and cross_ks is None:
        # the megakernel folds per-key scales unconditionally; bf16 caches
        # use ones (negligible extra read: (L, B, T) f32)
        L_, B_, T_, _ = cache.cross_v.shape
        cross_ks = jnp.ones((L_, B_, 1, T_), jnp.float32)
        cross_vs = cross_ks
    layer_xs = (
        dec["blocks"], qkv_w, qkv_b,
        # when the pallas self kernel reads the full rings directly, keep them
        # OUT of the scan xs so XLA never materializes per-layer slices
        None if (use_pallas_self or lb_effective) else cache.self_k,
        None if (use_pallas_self or lb_effective) else cache.self_v,
        None if (use_pallas_self or lb_effective) else cache.self_k_scale,
        None if (use_pallas_self or lb_effective) else cache.self_v_scale,
        # same for the cross cache when the fused cross kernel indexes the
        # full stacked (L, B, T, D) tensors by scalar-prefetch layer index
        None if (use_pallas_cross_block or lb_effective) else cache.cross_k,
        None if (use_pallas_cross_block or lb_effective) else cache.cross_v,
        None if (use_pallas_cross_block or lb_effective) else cache.cross_k_scale,
        None if (use_pallas_cross_block or lb_effective) else cache.cross_v_scale,
        jnp.arange(L, dtype=jnp.int32),
    )
    # NOTE: unrolling this layer loop (unroll=n_text_layer) made the remote
    # TPU compile exceed 30 minutes for the 32-step decode chunk; kept rolled.
    x, (ys_k, ys_v) = jax.lax.scan(block_fn, x, layer_xs)
    # single small write: (L, B, S, D) into the (L, B, C, D) rings
    new_sks, new_svs = cache.self_k_scale, cache.self_v_scale
    if self_quant:
        ys_k, k_sc = _quantize_rows(ys_k)  # (L,B,S,D) int8 + (L,B,S)
        ys_v, v_sc = _quantize_rows(ys_v)
        new_sks = jax.lax.dynamic_update_slice_in_dim(
            new_sks, k_sc[:, :, None, :], offset, axis=3
        )
        new_svs = jax.lax.dynamic_update_slice_in_dim(
            new_svs, v_sc[:, :, None, :], offset, axis=3
        )
    new_sk = jax.lax.dynamic_update_slice_in_dim(cache.self_k, ys_k, offset, axis=2)
    new_sv = jax.lax.dynamic_update_slice_in_dim(cache.self_v, ys_v, offset, axis=2)
    x = layer_norm(x, dec["ln_g"], dec["ln_b"])
    logits = (x @ dec["token_embedding"].astype(x.dtype).T).astype(jnp.float32)
    new_cache = KVCache(
        new_sk, new_sv, cache.cross_k, cache.cross_v, offset + S,
        cache.cross_k_scale, cache.cross_v_scale, new_sks, new_svs,
    )
    return logits, new_cache


def cross_attention_weights(
    params: Params,
    dims: ModelDimensions,
    tokens: jax.Array,  # (B, T)
    audio_features: jax.Array,  # (B, 1500, D)
) -> jax.Array:
    """Full-sequence decoder forward that returns per-layer cross-attention
    softmax weights, shape (L, B, H, T, 1500). Used for word-timing DTW
    (replaces the attention hooks of [pip:whisper] timing.add_word_timestamps).
    """
    dec = params["decoder"]
    T = tokens.shape[1]
    dtype = audio_features.dtype
    n_head = dims.n_text_head
    d_head = dims.n_text_state // n_head

    x = dec["token_embedding"][tokens].astype(dtype)
    x = x + dec["positional_embedding"][:T].astype(dtype)
    causal = jnp.triu(jnp.full((T, T), -jnp.inf, dtype=jnp.float32), k=1)[None, None]

    def block_fn(x, lp):
        h = layer_norm(x, lp["attn_ln_g"], lp["attn_ln_b"])
        q = _linear(h, lp["attn_q_w"], lp["attn_q_b"])
        k = _linear(h, lp["attn_k_w"])
        v = _linear(h, lp["attn_v_w"], lp["attn_v_b"])
        x = x + _linear(sdpa(q, k, v, n_head, causal), lp["attn_o_w"], lp["attn_o_b"])

        h = layer_norm(x, lp["cross_ln_g"], lp["cross_ln_b"])
        q = _linear(h, lp["cross_q_w"], lp["cross_q_b"])
        ck = _linear(audio_features, lp["cross_k_w"])
        cv = _linear(audio_features, lp["cross_v_w"], lp["cross_v_b"])
        scale = d_head ** -0.25
        qh = _split_heads(q, n_head) * scale
        kh = _split_heads(ck, n_head) * scale
        w_logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
        w = jax.nn.softmax(w_logits, axis=-1)
        vh = _split_heads(cv, n_head)
        attn = jnp.einsum("bhqk,bkhd->bqhd", w.astype(vh.dtype), vh).reshape(q.shape)
        x = x + _linear(attn, lp["cross_o_w"], lp["cross_o_b"])

        h = layer_norm(x, lp["mlp_ln_g"], lp["mlp_ln_b"])
        h = _linear(h, lp["mlp_w1"], lp["mlp_b1"])
        h = jax.nn.gelu(h, approximate=False)
        x = x + _linear(h, lp["mlp_w2"], lp["mlp_b2"])
        return x, w

    _, weights = jax.lax.scan(block_fn, x, dec["blocks"])
    return weights  # (L, B, H, T, 1500)


# ---------------------------------------------------------------------------
# misc public helpers (API parity with reference OLMoASR class)
# ---------------------------------------------------------------------------


def embed_audio(params, dims, mel, **kw):
    return encode_audio(params, dims, mel, **kw)


def logits(params, dims, tokens, audio_features, **kw):
    return decode_train(params, dims, tokens, audio_features, **kw)


def num_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
