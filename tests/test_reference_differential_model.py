"""Differential: the reference torch model forward vs our JAX rebuild.

The reference `olmoasr/model.py` is pure torch and runs on CPU, so the
"faithful rebuild" claim for models/whisper.py is proven by initializing the
REFERENCE model, converting its state_dict through models/convert.py, and
pinning fp32 forward agreement on identical inputs — encoder, decoder (with
and without the training padding mask), and the tied-embedding logits.

Reference anchors: olmoasr/model.py:53-113 (AudioEncoder conv+pos-embed),
266-454 (attention), 639-776 (TextDecoder mask composition), 778-923 (OLMoASR
forward).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from tests.ref_loader import load_reference

from olmoasr_tpu.models import whisper as m
from olmoasr_tpu.models.convert import torch_state_dict_to_params
from olmoasr_tpu.models.dims import ModelDimensions

# n_vocab must be the real 51864: the reference hard-codes the padding row's
# embedding index (model.py:665-667) and asserts on any other vocab size
DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=24, n_audio_state=64, n_audio_head=4, n_audio_layer=3,
    n_vocab=51864, n_text_ctx=20, n_text_state=64, n_text_head=4, n_text_layer=3,
)


@pytest.fixture(scope="module")
def pair():
    ref = load_reference()
    rdims = ref.model.ModelDimensions(**DIMS.__dict__)
    tmodel = ref.model.OLMoASR(rdims).eval()
    params = torch_state_dict_to_params(tmodel.state_dict(), DIMS)
    return tmodel, params


@pytest.fixture(scope="module")
def mel():
    rng = np.random.default_rng(0)
    # encoder downsamples 2x: n_audio_ctx*2 mel frames
    return rng.standard_normal((2, DIMS.n_mels, DIMS.n_audio_ctx * 2)).astype(
        np.float32
    )


def test_encoder_forward_matches(pair, mel):
    tmodel, params = pair
    with torch.no_grad():
        ref_out = tmodel.embed_audio(torch.from_numpy(mel)).numpy()
    out = np.asarray(
        m.encode_audio(params, DIMS, jnp.asarray(mel), compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-4)


def test_full_forward_matches(pair, mel):
    tmodel, params = pair
    rng = np.random.default_rng(1)
    toks = rng.integers(0, DIMS.n_vocab, (2, 8))
    with torch.no_grad():
        ref_logits = tmodel(
            torch.from_numpy(mel), torch.from_numpy(toks)
        ).numpy()
    ours = np.asarray(
        m.forward_train(
            params, DIMS, jnp.asarray(mel), jnp.asarray(toks, jnp.int32),
            compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(ours, ref_logits, atol=5e-4, rtol=1e-4)


def test_forward_with_padding_mask_matches(pair, mel):
    """The training configuration: per-sample -inf pad-column mask added to
    the causal mask (model.py:739-742, train_timestamps.py:314-329)."""
    tmodel, params = pair
    rng = np.random.default_rng(2)
    # the reference adds padding_mask to the FULL (n_text_ctx, n_text_ctx)
    # causal buffer, so training always runs at T = n_text_ctx
    T = DIMS.n_text_ctx
    toks = rng.integers(0, DIMS.n_vocab, (2, T))
    pad = np.zeros((2, T, T), np.float32)
    pad[0, :, 7:] = -np.inf
    pad[1, :, 5:] = -np.inf
    with torch.no_grad():
        ref_logits = tmodel(
            torch.from_numpy(mel),
            torch.from_numpy(toks),
            torch.from_numpy(pad),
        ).numpy()
    ours = np.asarray(
        m.forward_train(
            params, DIMS, jnp.asarray(mel), jnp.asarray(toks, jnp.int32),
            jnp.asarray(pad), compute_dtype=jnp.float32,
        )
    )
    # valid (non-pad-queried) positions must agree; fully-masked pad rows are
    # NaN-prone on the torch side (softmax over all -inf) so compare valid rows
    np.testing.assert_allclose(
        ours[0, :7], ref_logits[0, :7], atol=5e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        ours[1, :5], ref_logits[1, :5], atol=5e-4, rtol=1e-4
    )
    # compact (B, T) per-key form == the reference's full matrix semantics
    compact = np.zeros((2, T), np.float32)
    compact[0, 7:] = -np.inf
    compact[1, 5:] = -np.inf
    ours2 = np.asarray(
        m.forward_train(
            params, DIMS, jnp.asarray(mel), jnp.asarray(toks, jnp.int32),
            jnp.asarray(compact), compute_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(
        ours2[0, :7], ref_logits[0, :7], atol=5e-4, rtol=1e-4
    )


def test_inference_model_kv_cache_matches(pair, mel):
    """Reference inf_model.py hook-based KV cache vs our explicit KVCache:
    prefill + two incremental steps pin identical logits."""
    from olmoasr_tpu.models.convert import strip_padding_row

    ref = load_reference()
    tmodel, params = pair
    params = strip_padding_row(params)
    rdims = ref.model.ModelDimensions(**DIMS.__dict__)
    imodel = ref.inf_model.OLMoASR(rdims).eval()
    # inference checkpoints ship without the training padding row
    # (gen_inf_ckpt.py semantics)
    sd = dict(tmodel.state_dict())
    sd["decoder.token_embedding.weight"] = sd["decoder.token_embedding.weight"][
        : DIMS.n_vocab
    ]
    imodel.load_state_dict(sd)

    rng = np.random.default_rng(3)
    toks = rng.integers(0, DIMS.n_vocab, (2, 5))
    with torch.no_grad():
        audio_t = imodel.embed_audio(torch.from_numpy(mel))
        cache, hooks = imodel.install_kv_cache_hooks()
        # the kv_cache rides the decoder call (inf_model.py:320-363);
        # OLMoASR.logits() does not forward it
        l_pre = imodel.decoder(torch.from_numpy(toks), audio_t, kv_cache=cache)
        nxt = l_pre[:, -1].argmax(-1, keepdim=True)
        l_step = imodel.decoder(nxt, audio_t, kv_cache=cache)
        for h in hooks:
            h.remove()

    audio = m.encode_audio(
        params, DIMS, jnp.asarray(mel), compute_dtype=jnp.float32
    )
    # init_cache precomputes the per-layer cross K/V (inf_model.py's hooks do
    # this lazily on first forward); decode_step advances cache.index itself
    kv = m.init_cache(params, DIMS, audio)
    ours_pre, kv = m.decode_step(params, DIMS, jnp.asarray(toks, jnp.int32), kv)
    np.testing.assert_allclose(
        np.asarray(ours_pre), l_pre.numpy(), atol=5e-4, rtol=1e-4
    )
    ours_step, kv = m.decode_step(
        params, DIMS, jnp.asarray(nxt.numpy(), jnp.int32), kv
    )
    np.testing.assert_allclose(
        np.asarray(ours_step), l_step.numpy(), atol=5e-4, rtol=1e-4
    )
