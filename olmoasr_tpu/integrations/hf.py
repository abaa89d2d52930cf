"""Export to HuggingFace transformers (WhisperForConditionalGeneration).

Rebuild of ``/root/reference/demo/convert_openai_to_hf.py``: converts our
param pytree (or a reference ``.pt`` checkpoint via models/convert.py) into an
HF Whisper model + processor directory, so downstream HF pipelines can consume
OLMoASR-TPU checkpoints. Host-side; requires ``transformers``/``torch``.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.models.whisper import PADDING_TOKEN, Params, sinusoids


def params_to_hf_state_dict(params: Params, dims: ModelDimensions) -> Dict[str, Any]:
    """Our pytree -> HF WhisperForConditionalGeneration state_dict."""
    import torch

    sd: Dict[str, Any] = {}

    def put(name, arr, transpose=False):
        a = np.asarray(arr, dtype=np.float32)
        if transpose:
            a = a.T
        sd[name] = torch.from_numpy(np.ascontiguousarray(a))

    enc, dec = params["encoder"], params["decoder"]
    put("model.encoder.conv1.weight", np.asarray(enc["conv1_w"]).transpose(2, 1, 0))
    put("model.encoder.conv1.bias", enc["conv1_b"])
    put("model.encoder.conv2.weight", np.asarray(enc["conv2_w"]).transpose(2, 1, 0))
    put("model.encoder.conv2.bias", enc["conv2_b"])
    put("model.encoder.embed_positions.weight",
        sinusoids(dims.n_audio_ctx, dims.n_audio_state))
    put("model.encoder.layer_norm.weight", enc["ln_post_g"])
    put("model.encoder.layer_norm.bias", enc["ln_post_b"])

    def write_blocks(prefix: str, blocks: Dict[str, Any], cross: bool):
        L = np.asarray(blocks["attn_q_w"]).shape[0]
        for i in range(L):
            p = f"{prefix}.layers.{i}"
            put(f"{p}.self_attn_layer_norm.weight", blocks["attn_ln_g"][i])
            put(f"{p}.self_attn_layer_norm.bias", blocks["attn_ln_b"][i])
            put(f"{p}.self_attn.q_proj.weight", blocks["attn_q_w"][i], True)
            put(f"{p}.self_attn.q_proj.bias", blocks["attn_q_b"][i])
            put(f"{p}.self_attn.k_proj.weight", blocks["attn_k_w"][i], True)
            put(f"{p}.self_attn.v_proj.weight", blocks["attn_v_w"][i], True)
            put(f"{p}.self_attn.v_proj.bias", blocks["attn_v_b"][i])
            put(f"{p}.self_attn.out_proj.weight", blocks["attn_o_w"][i], True)
            put(f"{p}.self_attn.out_proj.bias", blocks["attn_o_b"][i])
            if cross:
                put(f"{p}.encoder_attn_layer_norm.weight", blocks["cross_ln_g"][i])
                put(f"{p}.encoder_attn_layer_norm.bias", blocks["cross_ln_b"][i])
                put(f"{p}.encoder_attn.q_proj.weight", blocks["cross_q_w"][i], True)
                put(f"{p}.encoder_attn.q_proj.bias", blocks["cross_q_b"][i])
                put(f"{p}.encoder_attn.k_proj.weight", blocks["cross_k_w"][i], True)
                put(f"{p}.encoder_attn.v_proj.weight", blocks["cross_v_w"][i], True)
                put(f"{p}.encoder_attn.v_proj.bias", blocks["cross_v_b"][i])
                put(f"{p}.encoder_attn.out_proj.weight", blocks["cross_o_w"][i], True)
                put(f"{p}.encoder_attn.out_proj.bias", blocks["cross_o_b"][i])
            put(f"{p}.final_layer_norm.weight", blocks["mlp_ln_g"][i])
            put(f"{p}.final_layer_norm.bias", blocks["mlp_ln_b"][i])
            put(f"{p}.fc1.weight", blocks["mlp_w1"][i], True)
            put(f"{p}.fc1.bias", blocks["mlp_b1"][i])
            put(f"{p}.fc2.weight", blocks["mlp_w2"][i], True)
            put(f"{p}.fc2.bias", blocks["mlp_b2"][i])

    write_blocks("model.encoder", enc["blocks"], cross=False)
    write_blocks("model.decoder", dec["blocks"], cross=True)

    emb = np.asarray(dec["token_embedding"])
    if emb.shape[0] == PADDING_TOKEN + 1:
        emb = emb[:PADDING_TOKEN]  # HF vocab is the inference vocab
    put("model.decoder.embed_tokens.weight", emb)
    put("model.decoder.embed_positions.weight", dec["positional_embedding"])
    put("model.decoder.layer_norm.weight", dec["ln_g"])
    put("model.decoder.layer_norm.bias", dec["ln_b"])
    put("proj_out.weight", emb)  # tied
    return sd


def make_hf_config(dims: ModelDimensions):
    from transformers import WhisperConfig

    return WhisperConfig(
        vocab_size=dims.n_vocab,
        num_mel_bins=dims.n_mels,
        d_model=dims.n_audio_state,
        encoder_layers=dims.n_audio_layer,
        encoder_attention_heads=dims.n_audio_head,
        decoder_layers=dims.n_text_layer,
        decoder_attention_heads=dims.n_text_head,
        encoder_ffn_dim=dims.n_audio_state * 4,
        decoder_ffn_dim=dims.n_text_state * 4,
        max_source_positions=dims.n_audio_ctx,
        max_target_positions=dims.n_text_ctx,
        bos_token_id=50256,
        eos_token_id=50256,
        pad_token_id=50256,
        decoder_start_token_id=50257,  # <|startoftranscript|>
    )


def export_to_hf(params: Params, dims: ModelDimensions, out_dir: str):
    """Write a loadable HF model directory."""
    from transformers import WhisperForConditionalGeneration

    config = make_hf_config(dims)
    model = WhisperForConditionalGeneration(config)
    sd = params_to_hf_state_dict(params, dims)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # embed_positions for encoder is a registered buffer in some versions
    real_missing = [m for m in missing if "embed_positions" not in m]
    if real_missing or unexpected:
        raise ValueError(f"HF export mismatch: missing={real_missing} unexpected={unexpected}")
    model.save_pretrained(out_dir)
    return out_dir


def convert_checkpoint_to_hf(ckpt_path: str, out_dir: str):
    """Reference .pt / native .npz checkpoint -> HF directory
    (demo/convert_openai_to_hf.py equivalent)."""
    from olmoasr_tpu.models.convert import load_npz_checkpoint, load_torch_checkpoint

    if ckpt_path.endswith(".npz"):
        params, dims = load_npz_checkpoint(ckpt_path)
    else:
        params, dims = load_torch_checkpoint(ckpt_path, inference=True)
    return export_to_hf(params, dims, out_dir)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out_dir", required=True)
    a = p.parse_args()
    convert_checkpoint_to_hf(a.ckpt, a.out_dir)
