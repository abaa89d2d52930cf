"""Validation loop tests (teacher-forced loss + argmax WER)."""

import numpy as np
import jax
import jax.numpy as jnp

from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.models.whisper import PADDING_TOKEN, init_params
from olmoasr_tpu.tokenizer import get_tokenizer
from olmoasr_tpu.training.validate import argmax_wer, validate

TINY = ModelDimensions(
    n_mels=80, n_audio_ctx=24, n_audio_state=32, n_audio_head=2, n_audio_layer=1,
    n_vocab=51864, n_text_ctx=16, n_text_state=32, n_text_head=2, n_text_layer=1,
)


def test_argmax_wer_perfect_prediction():
    tok = get_tokenizer(False)
    ids = tok.encode(" hello world")
    T, V = 16, 51864
    targets = np.full((1, T), PADDING_TOKEN, np.int64)
    targets[0, : len(ids)] = ids
    logits = np.zeros((1, T, V), np.float32)
    for t, i in enumerate(ids):
        logits[0, t, i] = 10.0
    wer, rows = argmax_wer(logits, targets)
    assert wer == 0.0
    assert rows[0]["pred"] == rows[0]["target"] == "hello world"


def test_validate_runs():
    params = init_params(jax.random.PRNGKey(0), TINY)
    tok = get_tokenizer(False)
    ids = [tok.sot] + tok.encode(" hi") + [tok.eot]
    ti = np.full((2, TINY.n_text_ctx), PADDING_TOKEN, np.int64)
    tt = np.full((2, TINY.n_text_ctx), PADDING_TOKEN, np.int64)
    ti[:, : len(ids) - 1] = ids[:-1]
    tt[:, : len(ids) - 1] = ids[1:]
    batch = {
        "mel": np.zeros((2, 80, 48), np.float32),
        "text_input": ti,
        "text_target": tt,
    }
    out = validate(params, TINY, [batch, batch], compute_dtype=jnp.float32)
    assert np.isfinite(out["val/loss"])
    assert out["val/n_batches"] == 2
    assert 0.0 <= out["val/wer"] <= 5.0  # random model: garbage but bounded-ish
