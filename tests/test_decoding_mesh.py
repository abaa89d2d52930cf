"""Multi-chip batched inference: sharded decode == single-device decode.

SURVEY §5 long-context story ("batched multi-window decoding across chips"):
with a mesh registered via decoding.set_infer_mesh, decode() runs the whole
program inside shard_map with the window batch sharded. These tests pin
equivalence on the 8-device CPU mesh for the greedy and beam paths (both
deterministic), and exercise the sampling path's per-shard rng decorrelation.
Reference anchor for cross-device batched eval: scripts/eval/eval.py:1845.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from olmoasr_tpu import decoding
from olmoasr_tpu.models import whisper as m
from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.parallel import mesh as mesh_mod

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51864, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)

SAMPLE_LEN = 12


@pytest.fixture(scope="module")
def params():
    return m.init_params(jax.random.PRNGKey(0), DIMS, include_padding_token=False)


@pytest.fixture(scope="module")
def mel():
    return jax.random.normal(jax.random.PRNGKey(1), (8, 80, 3000)) * 0.5


@pytest.fixture()
def infer_mesh():
    mesh = mesh_mod.make_mesh(8, 1)
    decoding.set_infer_mesh(mesh)
    yield mesh
    decoding.set_infer_mesh(None)


def _texts(results):
    return [(r.tokens, round(r.avg_logprob, 4)) for r in results]


def test_greedy_sharded_matches_single_device(params, mel, infer_mesh):
    opts = decoding.DecodingOptions(
        temperature=0.0, sample_len=SAMPLE_LEN, fp16=False, without_timestamps=True
    )
    decoding.set_infer_mesh(None)
    ref = decoding.decode(params, DIMS, mel, opts)
    decoding.set_infer_mesh(infer_mesh)
    out = decoding.decode(params, DIMS, mel, opts)
    assert [r.tokens for r in out] == [r.tokens for r in ref]
    np.testing.assert_allclose(
        [r.no_speech_prob for r in out], [r.no_speech_prob for r in ref],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        [r.avg_logprob for r in out], [r.avg_logprob for r in ref], atol=1e-4
    )


def test_beam_sharded_matches_single_device(params, mel, infer_mesh):
    opts = decoding.DecodingOptions(
        temperature=0.0, beam_size=2, sample_len=SAMPLE_LEN, fp16=False,
        without_timestamps=True,
    )
    decoding.set_infer_mesh(None)
    ref = decoding.decode(params, DIMS, mel, opts)
    decoding.set_infer_mesh(infer_mesh)
    out = decoding.decode(params, DIMS, mel, opts)
    assert [r.tokens for r in out] == [r.tokens for r in ref]
    np.testing.assert_allclose(
        [r.avg_logprob for r in out], [r.avg_logprob for r in ref], atol=1e-4
    )


def test_sampling_sharded_runs_and_decorrelates(params, mel, infer_mesh):
    """temperature>0 with best_of: shards fold their index into the rng, so
    the run completes and produces per-window results (bit-equality with the
    single-device layout is not expected for sampling)."""
    opts = decoding.DecodingOptions(
        temperature=0.8, best_of=2, sample_len=SAMPLE_LEN, fp16=False,
        without_timestamps=True,
    )
    out = decoding.decode(params, DIMS, mel, opts)
    assert len(out) == 8
    assert all(isinstance(r.tokens, list) for r in out)


def test_non_divisible_batch_falls_back(params, infer_mesh):
    """B=3 over an 8-device mesh cannot shard: falls back to single-device."""
    mel3 = jax.random.normal(jax.random.PRNGKey(2), (3, 80, 3000)) * 0.5
    opts = decoding.DecodingOptions(
        temperature=0.0, sample_len=SAMPLE_LEN, fp16=False, without_timestamps=True
    )
    out = decoding.decode(params, DIMS, mel3, opts)
    assert len(out) == 3
