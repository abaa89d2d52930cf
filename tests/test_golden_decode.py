"""Golden-sequence regression tests (VERDICT r1 next-round #3): greedy, beam,
and timestamp decodes of a deterministic random-init micro model are pinned
as fixtures. Any numerics regression in the decode stack (filters, cache,
attention, beam bookkeeping) shows up as a token diff here long before real
weights are available.

Regenerate (only after an INTENDED behavior change):
tests/fixtures/golden_micro_decode.json via the snippet in git history.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from olmoasr_tpu.api import OLMoASR
from olmoasr_tpu.decoding import DecodingOptions
from olmoasr_tpu.models.dims import ModelDimensions

MICRO = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4, n_audio_layer=1,
    n_vocab=51864, n_text_ctx=448, n_text_state=64, n_text_head=4, n_text_layer=1,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_micro_decode.json")


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def model():
    return OLMoASR(MICRO, inference=True)  # PRNGKey(0) init — deterministic


@pytest.fixture(scope="module")
def mel():
    rng = np.random.default_rng(1234)
    return jnp.asarray(rng.standard_normal((2, 80, 3000)) * 0.3, jnp.float32)


def test_greedy_tokens_pinned(model, mel, golden):
    res = model.decode(
        mel, DecodingOptions(without_timestamps=True, fp16=False, sample_len=16)
    )
    assert [list(map(int, r.tokens)) for r in res] == golden["greedy"]
    for r, lp in zip(res, golden["greedy_avg_logprob"]):
        assert abs(float(r.avg_logprob) - lp) < 5e-3


def test_beam_tokens_pinned(model, mel, golden):
    res = model.decode(mel, DecodingOptions(beam_size=3, fp16=False, sample_len=16))
    assert [list(map(int, r.tokens)) for r in res] == golden["beam3"]


def test_timestamp_tokens_pinned(model, mel, golden):
    res = model.decode(
        mel, DecodingOptions(without_timestamps=False, fp16=False, sample_len=16)
    )
    assert [list(map(int, r.tokens)) for r in res] == golden["timestamps"]
