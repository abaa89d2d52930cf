"""Public API tests: load_model paths, model handle methods."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from olmoasr_tpu.api import OLMoASR, build_model, load_model
from olmoasr_tpu.models.convert import save_npz_checkpoint
from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.models.whisper import PADDING_TOKEN, init_params

MICRO = ModelDimensions(
    n_mels=80, n_audio_ctx=24, n_audio_state=32, n_audio_head=2, n_audio_layer=1,
    n_vocab=51864, n_text_ctx=16, n_text_state=32, n_text_head=2, n_text_layer=1,
)


def test_load_model_npz_strips_padding(tmp_path):
    params = init_params(jax.random.PRNGKey(0), MICRO, include_padding_token=True)
    path = str(tmp_path / "m.npz")
    save_npz_checkpoint(path, params, MICRO)

    inf = load_model(path, inference=True)
    assert inf.params["decoder"]["token_embedding"].shape[0] == 51864
    train = load_model(path, inference=False)
    assert train.params["decoder"]["token_embedding"].shape[0] == 51865


def test_unknown_model_name():
    with pytest.raises(RuntimeError, match="available models"):
        load_model("no-such-model")


def test_model_handle_methods():
    m = OLMoASR(MICRO, inference=True)
    assert not m.is_multilingual
    assert m.num_languages == 99
    assert m.num_params() > 0
    mel = jnp.zeros((1, 80, 48))
    feats = m.embed_audio(mel)
    assert feats.shape == (1, 24, 32)
    logits = m.logits(jnp.zeros((1, 4), jnp.int32), feats)
    assert logits.shape == (1, 4, 51864)
    out = m(mel, jnp.zeros((1, 4), jnp.int32))  # __call__ == forward
    assert out.shape == (1, 4, 51864)


def test_build_model_variants():
    m = build_model("tiny.en", inference=True)
    assert m.dims.n_audio_state == 384
