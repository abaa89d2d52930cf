"""Model tests: shapes, parameter counts, causality, and the load-bearing
invariant that KV-cached incremental decoding reproduces the full forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from olmoasr_tpu.models import whisper as m
from olmoasr_tpu.models.dims import VARIANT_TO_DIMS, ModelDimensions, param_count

TEST_DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=51864, n_text_ctx=448, n_text_state=64, n_text_head=4, n_text_layer=2,
)

TINY_DIMS = ModelDimensions(
    n_mels=8, n_audio_ctx=12, n_audio_state=32, n_audio_head=2, n_audio_layer=2,
    n_vocab=128, n_text_ctx=16, n_text_state=32, n_text_head=2, n_text_layer=2,
)


@pytest.fixture(scope="module")
def tiny_params():
    return m.init_params(jax.random.PRNGKey(0), TINY_DIMS, include_padding_token=False)


def test_param_count_tiny_en():
    # reference reports ~39M params for tiny.en (train_timestamps.py:52-58)
    n = param_count(VARIANT_TO_DIMS["tiny.en"])
    assert 35e6 < n < 42e6
    n_large = param_count(VARIANT_TO_DIMS["large.en"])
    assert 1.4e9 < n_large < 1.7e9


def test_init_param_shapes():
    params = m.init_params(jax.random.PRNGKey(0), TEST_DIMS)
    d = TEST_DIMS.n_audio_state
    assert params["encoder"]["conv1_w"].shape == (3, 80, d)
    assert params["encoder"]["blocks"]["attn_q_w"].shape == (2, d, d)
    # +1 padding row (model.py:660-667)
    assert params["decoder"]["token_embedding"].shape == (51865, d)
    # padding row zeroed
    assert np.abs(np.asarray(params["decoder"]["token_embedding"][51864])).max() == 0.0
    inf_params = m.init_params(
        jax.random.PRNGKey(0), TEST_DIMS, include_padding_token=False
    )
    assert inf_params["decoder"]["token_embedding"].shape == (51864, d)


def test_encoder_output_shape(tiny_params):
    mel = jnp.zeros((2, TINY_DIMS.n_mels, TINY_DIMS.n_audio_ctx * 2))
    out = m.encode_audio(tiny_params, TINY_DIMS, mel, compute_dtype=jnp.float32)
    assert out.shape == (2, TINY_DIMS.n_audio_ctx, TINY_DIMS.n_audio_state)


def test_decoder_causality(tiny_params):
    """Changing a future token must not affect earlier logits."""
    key = jax.random.PRNGKey(1)
    mel = jax.random.normal(key, (1, TINY_DIMS.n_mels, TINY_DIMS.n_audio_ctx * 2))
    audio = m.encode_audio(tiny_params, TINY_DIMS, mel, compute_dtype=jnp.float32)
    toks = jnp.array([[5, 6, 7, 8]])
    toks2 = toks.at[0, 3].set(100)
    l1 = m.decode_train(tiny_params, TINY_DIMS, toks, audio)
    l2 = m.decode_train(tiny_params, TINY_DIMS, toks2, audio)
    np.testing.assert_allclose(l1[0, :3], l2[0, :3], atol=1e-5)
    assert np.abs(np.asarray(l1[0, 3] - l2[0, 3])).max() > 1e-4


def test_kv_cache_matches_full_forward(tiny_params):
    """Prefill + single-token steps == full-sequence forward (greedy parity)."""
    key = jax.random.PRNGKey(2)
    mel = jax.random.normal(key, (2, TINY_DIMS.n_mels, TINY_DIMS.n_audio_ctx * 2))
    audio = m.encode_audio(tiny_params, TINY_DIMS, mel, compute_dtype=jnp.float32)
    toks = jax.random.randint(key, (2, 8), 0, TINY_DIMS.n_vocab)

    full = m.decode_train(tiny_params, TINY_DIMS, toks, audio)

    # prefill 3 tokens, then 5 single-token steps
    cache = m.init_cache(tiny_params, TINY_DIMS, audio, max_len=TINY_DIMS.n_text_ctx)
    logits_pre, cache = m.decode_step(tiny_params, TINY_DIMS, toks[:, :3], cache)
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(full[:, :3]), atol=2e-4, rtol=1e-3
    )
    for i in range(3, 8):
        step_logits, cache = m.decode_step(
            tiny_params, TINY_DIMS, toks[:, i : i + 1], cache
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full[:, i]),
            atol=2e-4,
            rtol=1e-3,
        )


def test_padding_mask_blocks_attention(tiny_params):
    """With an additive padding mask, logits at valid positions must not depend
    on the padded region's token values (train_timestamps.py:314-329)."""
    key = jax.random.PRNGKey(3)
    mel = jax.random.normal(key, (1, TINY_DIMS.n_mels, TINY_DIMS.n_audio_ctx * 2))
    audio = m.encode_audio(tiny_params, TINY_DIMS, mel, compute_dtype=jnp.float32)
    T = 6
    valid = 3
    pad_mask = np.zeros((1, T, T), np.float32)
    pad_mask[:, :, valid:] = -np.inf
    toks = jnp.array([[5, 6, 7, 1, 1, 1]])
    toks2 = jnp.array([[5, 6, 7, 9, 9, 9]])
    l1 = m.decode_train(tiny_params, TINY_DIMS, toks, audio, jnp.asarray(pad_mask))
    l2 = m.decode_train(tiny_params, TINY_DIMS, toks2, audio, jnp.asarray(pad_mask))
    np.testing.assert_allclose(l1[0, :valid], l2[0, :valid], atol=1e-5)
    # compact (B, T) per-key bias == the full (B, T, T) column mask
    l3 = m.decode_train(
        tiny_params, TINY_DIMS, toks, audio, jnp.asarray(pad_mask[:, 0, :])
    )
    np.testing.assert_allclose(l1, l3, atol=1e-6)


def test_forward_train_shape_and_dtype(tiny_params):
    mel = jnp.zeros((2, TINY_DIMS.n_mels, TINY_DIMS.n_audio_ctx * 2))
    toks = jnp.zeros((2, 8), jnp.int32)
    logits = m.forward_train(
        tiny_params, TINY_DIMS, mel, toks, compute_dtype=jnp.float32
    )
    assert logits.shape == (2, 8, TINY_DIMS.n_vocab)
    assert logits.dtype == jnp.float32


def test_remat_matches(tiny_params):
    mel = jnp.ones((1, TINY_DIMS.n_mels, TINY_DIMS.n_audio_ctx * 2)) * 0.1
    toks = jnp.array([[1, 2, 3]])
    a = m.forward_train(tiny_params, TINY_DIMS, mel, toks, compute_dtype=jnp.float32)
    b = m.forward_train(
        tiny_params, TINY_DIMS, mel, toks, compute_dtype=jnp.float32, remat=True
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dw_barrier_grads_identical(tiny_params, monkeypatch):
    """OLMOASR_DW_BARRIER only splits an XLA fusion (dW matmul out of the
    scan's stacked-grad DUS); values and gradients must be bit-identical."""
    mel = jnp.ones((1, TINY_DIMS.n_mels, TINY_DIMS.n_audio_ctx * 2)) * 0.1
    toks = jnp.array([[1, 2, 3]])

    def loss(p):
        lg = m.forward_train(
            p, TINY_DIMS, mel, toks, compute_dtype=jnp.float32, remat=True
        )
        return jnp.sum(lg * lg) / lg.size

    monkeypatch.delenv("OLMOASR_DW_BARRIER", raising=False)
    l0, g0 = jax.value_and_grad(loss)(tiny_params)
    monkeypatch.setenv("OLMOASR_DW_BARRIER", "1")
    l1, g1 = jax.value_and_grad(loss)(tiny_params)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g0,
        g1,
    )


def test_kv_quant_cache_close_to_full(tiny_params):
    """int8 cross-KV decode stays close to the exact forward."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(2)
    mel = jax.random.normal(key, (2, TINY_DIMS.n_mels, TINY_DIMS.n_audio_ctx * 2))
    audio = m.encode_audio(tiny_params, TINY_DIMS, mel, compute_dtype=jnp.float32)
    toks = jax.random.randint(key, (2, 8), 0, TINY_DIMS.n_vocab)
    full = m.decode_train(tiny_params, TINY_DIMS, toks, audio)
    cache = m.init_cache(
        tiny_params, TINY_DIMS, audio, max_len=TINY_DIMS.n_text_ctx,
        quantize_cross=True,
    )
    assert cache.cross_k.dtype == jnp.int8
    logits_pre, cache = m.decode_step(tiny_params, TINY_DIMS, toks[:, :8], cache)
    # quantization error is small relative to logit scale
    err = float(jnp.abs(logits_pre - full).max())
    ref = float(jnp.abs(full).max())
    assert err / ref < 0.05, (err, ref)
    # and top-1 predictions agree
    assert bool(
        jnp.all(jnp.argmax(logits_pre, -1) == jnp.argmax(full, -1))
    )


def test_self_ring_quantization(tiny_params):
    """int8 self rings (optional; off by default in the decode path) stay
    close to the exact forward."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(2)
    mel = jax.random.normal(key, (2, TINY_DIMS.n_mels, TINY_DIMS.n_audio_ctx * 2))
    audio = m.encode_audio(tiny_params, TINY_DIMS, mel, compute_dtype=jnp.float32)
    toks = jax.random.randint(key, (2, 8), 0, TINY_DIMS.n_vocab)
    full = m.decode_train(tiny_params, TINY_DIMS, toks, audio)
    cache = m.init_cache(
        tiny_params, TINY_DIMS, audio, max_len=16,
        quantize_cross=True, quantize_self=True,
    )
    assert cache.self_k.dtype == jnp.int8
    logits, cache = m.decode_step(tiny_params, TINY_DIMS, toks[:, :4], cache)
    for i in range(4, 8):
        logits, cache = m.decode_step(tiny_params, TINY_DIMS, toks[:, i:i+1], cache)
        assert bool(jnp.all(jnp.argmax(logits[:, 0], -1) == jnp.argmax(full[:, i], -1)))


def test_decode_train_kernel_path_matches_default(tiny_params, monkeypatch):
    """OLMOASR_DEC_ATTN=kernel_interpret (the Pallas decoder training kernels,
    interpret mode) must match the XLA path on both the no-mask and the
    compact (B, T) key-bias forms."""
    key = jax.random.PRNGKey(7)
    mel = jax.random.normal(key, (2, TINY_DIMS.n_mels, TINY_DIMS.n_audio_ctx * 2))
    audio = m.encode_audio(tiny_params, TINY_DIMS, mel, compute_dtype=jnp.float32)
    audio = audio.astype(jnp.bfloat16)
    T = TINY_DIMS.n_text_ctx
    toks = jax.random.randint(key, (2, T), 0, TINY_DIMS.n_vocab)
    kb = np.zeros((2, T), np.float32)
    kb[0, T - 3:] = -np.inf
    kb[1, T - 6:] = -np.inf

    ref_nomask = m.decode_train(tiny_params, TINY_DIMS, toks, audio)
    ref_bias = m.decode_train(
        tiny_params, TINY_DIMS, toks, audio, jnp.asarray(kb)
    )
    monkeypatch.setenv("OLMOASR_DEC_ATTN", "kernel_interpret")
    out_nomask = m.decode_train(tiny_params, TINY_DIMS, toks, audio)
    out_bias = m.decode_train(
        tiny_params, TINY_DIMS, toks, audio, jnp.asarray(kb)
    )
    # bf16 activations: compare logits within the bf16 noise band
    np.testing.assert_allclose(
        np.asarray(out_nomask), np.asarray(ref_nomask), atol=0.15
    )
    np.testing.assert_allclose(
        np.asarray(out_bias[:, : T - 6]), np.asarray(ref_bias[:, : T - 6]),
        atol=0.15,
    )
