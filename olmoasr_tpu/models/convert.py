"""Checkpoint conversion: reference PyTorch ``.pt`` <-> our JAX param pytrees.

The reference releases checkpoints as ``{"dims": {...}, "model_state_dict": {...}}``
(``/root/reference/olmoasr/__init__.py:150-161``). Training checkpoints carry an
(n_vocab+1)-row token embedding whose last row is the padding token; inference
checkpoints strip it (``/root/reference/scripts/eval/gen_inf_ckpt.py:4-11``).

Torch is used ONLY here, host-side, to read/write the interchange format; the
framework itself never touches it.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.models.whisper import PADDING_TOKEN, Params


def torch_state_dict_to_params(
    state_dict: Dict[str, Any], dims: ModelDimensions
) -> Params:
    """Convert a reference/whisper torch state_dict into our stacked pytree."""

    def npy(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t)

    sd = {k.removeprefix("module."): npy(v) for k, v in state_dict.items()}

    def stack(prefix: str, n_layer: int, fmt: str, transpose: bool):
        arrs = []
        for i in range(n_layer):
            a = sd[f"{prefix}.{i}.{fmt}"]
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs))

    def block_stack(prefix: str, n_layer: int, cross: bool) -> Dict[str, Any]:
        p = {
            "attn_ln_g": stack(prefix, n_layer, "attn_ln.weight", False),
            "attn_ln_b": stack(prefix, n_layer, "attn_ln.bias", False),
            "attn_q_w": stack(prefix, n_layer, "attn.query.weight", True),
            "attn_q_b": stack(prefix, n_layer, "attn.query.bias", False),
            "attn_k_w": stack(prefix, n_layer, "attn.key.weight", True),
            "attn_v_w": stack(prefix, n_layer, "attn.value.weight", True),
            "attn_v_b": stack(prefix, n_layer, "attn.value.bias", False),
            "attn_o_w": stack(prefix, n_layer, "attn.out.weight", True),
            "attn_o_b": stack(prefix, n_layer, "attn.out.bias", False),
            "mlp_ln_g": stack(prefix, n_layer, "mlp_ln.weight", False),
            "mlp_ln_b": stack(prefix, n_layer, "mlp_ln.bias", False),
            "mlp_w1": stack(prefix, n_layer, "mlp.0.weight", True),
            "mlp_b1": stack(prefix, n_layer, "mlp.0.bias", False),
            "mlp_w2": stack(prefix, n_layer, "mlp.2.weight", True),
            "mlp_b2": stack(prefix, n_layer, "mlp.2.bias", False),
        }
        if cross:
            p.update({
                "cross_ln_g": stack(prefix, n_layer, "cross_attn_ln.weight", False),
                "cross_ln_b": stack(prefix, n_layer, "cross_attn_ln.bias", False),
                "cross_q_w": stack(prefix, n_layer, "cross_attn.query.weight", True),
                "cross_q_b": stack(prefix, n_layer, "cross_attn.query.bias", False),
                "cross_k_w": stack(prefix, n_layer, "cross_attn.key.weight", True),
                "cross_v_w": stack(prefix, n_layer, "cross_attn.value.weight", True),
                "cross_v_b": stack(prefix, n_layer, "cross_attn.value.bias", False),
                "cross_o_w": stack(prefix, n_layer, "cross_attn.out.weight", True),
                "cross_o_b": stack(prefix, n_layer, "cross_attn.out.bias", False),
            })
        return p

    encoder = {
        # torch Conv1d weight (out, in, k) -> ours (k, in, out)
        "conv1_w": jnp.asarray(sd["encoder.conv1.weight"].transpose(2, 1, 0)),
        "conv1_b": jnp.asarray(sd["encoder.conv1.bias"]),
        "conv2_w": jnp.asarray(sd["encoder.conv2.weight"].transpose(2, 1, 0)),
        "conv2_b": jnp.asarray(sd["encoder.conv2.bias"]),
        "blocks": block_stack("encoder.blocks", dims.n_audio_layer, cross=False),
        "ln_post_g": jnp.asarray(sd["encoder.ln_post.weight"]),
        "ln_post_b": jnp.asarray(sd["encoder.ln_post.bias"]),
    }
    decoder = {
        "token_embedding": jnp.asarray(sd["decoder.token_embedding.weight"]),
        "positional_embedding": jnp.asarray(sd["decoder.positional_embedding"]),
        "blocks": block_stack("decoder.blocks", dims.n_text_layer, cross=True),
        "ln_g": jnp.asarray(sd["decoder.ln.weight"]),
        "ln_b": jnp.asarray(sd["decoder.ln.bias"]),
    }
    return {"encoder": encoder, "decoder": decoder}


def params_to_torch_state_dict(params: Params, dims: ModelDimensions) -> Dict[str, Any]:
    """Inverse conversion, for exporting back to the reference format."""
    import torch

    sd: Dict[str, Any] = {}

    def put(name, arr, transpose=False):
        a = np.asarray(arr)
        if transpose:
            a = a.T
        sd[name] = torch.from_numpy(np.ascontiguousarray(a))

    enc, dec = params["encoder"], params["decoder"]
    put("encoder.conv1.weight", np.asarray(enc["conv1_w"]).transpose(2, 1, 0))
    put("encoder.conv1.bias", enc["conv1_b"])
    put("encoder.conv2.weight", np.asarray(enc["conv2_w"]).transpose(2, 1, 0))
    put("encoder.conv2.bias", enc["conv2_b"])
    put("encoder.ln_post.weight", enc["ln_post_g"])
    put("encoder.ln_post.bias", enc["ln_post_b"])
    from olmoasr_tpu.models.whisper import sinusoids

    sd["encoder.positional_embedding"] = torch.from_numpy(
        sinusoids(dims.n_audio_ctx, dims.n_audio_state)
    )

    def unstack(prefix, blocks, mapping):
        for ours, (theirs, transpose) in mapping.items():
            arr = np.asarray(blocks[ours])
            for i in range(arr.shape[0]):
                put(f"{prefix}.{i}.{theirs}", arr[i], transpose)

    self_map = {
        "attn_ln_g": ("attn_ln.weight", False), "attn_ln_b": ("attn_ln.bias", False),
        "attn_q_w": ("attn.query.weight", True), "attn_q_b": ("attn.query.bias", False),
        "attn_k_w": ("attn.key.weight", True),
        "attn_v_w": ("attn.value.weight", True), "attn_v_b": ("attn.value.bias", False),
        "attn_o_w": ("attn.out.weight", True), "attn_o_b": ("attn.out.bias", False),
        "mlp_ln_g": ("mlp_ln.weight", False), "mlp_ln_b": ("mlp_ln.bias", False),
        "mlp_w1": ("mlp.0.weight", True), "mlp_b1": ("mlp.0.bias", False),
        "mlp_w2": ("mlp.2.weight", True), "mlp_b2": ("mlp.2.bias", False),
    }
    cross_map = {
        "cross_ln_g": ("cross_attn_ln.weight", False),
        "cross_ln_b": ("cross_attn_ln.bias", False),
        "cross_q_w": ("cross_attn.query.weight", True),
        "cross_q_b": ("cross_attn.query.bias", False),
        "cross_k_w": ("cross_attn.key.weight", True),
        "cross_v_w": ("cross_attn.value.weight", True),
        "cross_v_b": ("cross_attn.value.bias", False),
        "cross_o_w": ("cross_attn.out.weight", True),
        "cross_o_b": ("cross_attn.out.bias", False),
    }
    unstack("encoder.blocks", enc["blocks"], self_map)
    unstack("decoder.blocks", dec["blocks"], {**self_map, **cross_map})
    put("decoder.token_embedding.weight", dec["token_embedding"])
    put("decoder.positional_embedding", dec["positional_embedding"])
    put("decoder.ln.weight", dec["ln_g"])
    put("decoder.ln.bias", dec["ln_b"])
    return sd


def strip_padding_row(params: Params) -> Params:
    """Training -> inference params: drop the padding-token embedding row
    (gen_inf_ckpt.py:4-11)."""
    emb = params["decoder"]["token_embedding"]
    if emb.shape[0] == PADDING_TOKEN + 1:
        params = dict(params)
        params["decoder"] = dict(params["decoder"])
        params["decoder"]["token_embedding"] = emb[:PADDING_TOKEN]
    return params


def load_torch_checkpoint(
    path: str, inference: bool = True
) -> Tuple[Params, ModelDimensions]:
    """Load a reference ``.pt`` checkpoint (dims + model_state_dict)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    dims = ModelDimensions(**ckpt["dims"])
    state_dict = ckpt.get("model_state_dict") or ckpt.get("state_dict") or ckpt
    params = torch_state_dict_to_params(state_dict, dims)
    if inference:
        params = strip_padding_row(params)
    return params, dims


# ---------------------------------------------------------------------------
# native (torch-free) checkpoint format: npz + dims json sidecar
# ---------------------------------------------------------------------------


def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key + "/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_npz_checkpoint(path: str, params: Params, dims: ModelDimensions) -> None:
    flat = _flatten(params)
    np.savez(path, **flat, __dims__=json.dumps(dims.to_dict()))


def load_npz_checkpoint(path: str) -> Tuple[Params, ModelDimensions]:
    data = np.load(path, allow_pickle=False)
    dims = ModelDimensions(**json.loads(str(data["__dims__"])))
    flat = {k: data[k] for k in data.files if k != "__dims__"}
    return _unflatten(flat), dims
