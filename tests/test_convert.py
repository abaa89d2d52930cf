"""Checkpoint converter tests: native npz round-trip, torch .pt round-trip,
padding-row strip, HF export state-dict shape agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from olmoasr_tpu.models import convert
from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.models.whisper import PADDING_TOKEN, init_params

MICRO = ModelDimensions(
    n_mels=80, n_audio_ctx=24, n_audio_state=32, n_audio_head=2, n_audio_layer=2,
    n_vocab=51864, n_text_ctx=16, n_text_state=32, n_text_head=2, n_text_layer=2,
)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), MICRO, include_padding_token=True)


def _max_diff(a, b):
    return max(
        float(jnp.abs(x - y).max()) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_npz_roundtrip(params, tmp_path):
    path = str(tmp_path / "ck.npz")
    convert.save_npz_checkpoint(path, params, MICRO)
    p2, dims2 = convert.load_npz_checkpoint(path)
    assert dims2 == MICRO
    assert _max_diff(params, p2) == 0.0


def test_torch_roundtrip(params, tmp_path):
    torch = pytest.importorskip("torch")
    sd = convert.params_to_torch_state_dict(params, MICRO)
    # reference naming convention
    assert "encoder.blocks.0.attn.query.weight" in sd
    assert "decoder.blocks.1.cross_attn.out.bias" in sd
    assert sd["encoder.conv1.weight"].shape == (32, 80, 3)
    path = str(tmp_path / "ck.pt")
    torch.save({"dims": MICRO.to_dict(), "model_state_dict": sd}, path)
    p2, dims2 = convert.load_torch_checkpoint(path, inference=False)
    assert dims2 == MICRO
    assert _max_diff(params, p2) == 0.0


def test_strip_padding_row(params):
    stripped = convert.strip_padding_row(params)
    assert stripped["decoder"]["token_embedding"].shape[0] == PADDING_TOKEN
    # idempotent
    again = convert.strip_padding_row(stripped)
    assert again["decoder"]["token_embedding"].shape[0] == PADDING_TOKEN


def test_module_prefix_stripped(params, tmp_path):
    """DDP checkpoints carry 'module.' prefixes (train_timestamps.py:930-972)."""
    torch = pytest.importorskip("torch")
    sd = convert.params_to_torch_state_dict(params, MICRO)
    sd_pref = {f"module.{k}": v for k, v in sd.items()}
    path = str(tmp_path / "ddp.pt")
    torch.save({"dims": MICRO.to_dict(), "model_state_dict": sd_pref}, path)
    p2, _ = convert.load_torch_checkpoint(path, inference=False)
    assert _max_diff(params, p2) == 0.0


def test_hf_state_dict_shapes(params):
    pytest.importorskip("torch")
    from olmoasr_tpu.integrations.hf import params_to_hf_state_dict

    sd = params_to_hf_state_dict(params, MICRO)
    assert sd["model.decoder.embed_tokens.weight"].shape == (51864, 32)
    assert sd["model.encoder.layers.0.self_attn.q_proj.weight"].shape == (32, 32)
    assert sd["model.decoder.layers.1.encoder_attn.k_proj.weight"].shape == (32, 32)
    assert sd["model.encoder.conv2.weight"].shape == (32, 32, 3)
    assert "proj_out.weight" in sd
