"""Decoding tests: filters, greedy/beam mechanics, scoring — on a tiny random
model (no released weights in this environment), validating structure and
whisper-rule semantics rather than transcription quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from olmoasr_tpu import decoding
from olmoasr_tpu.models import whisper as m
from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.tokenizer import get_tokenizer

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=51864, n_text_ctx=448, n_text_state=64, n_text_head=4, n_text_layer=2,
)


@pytest.fixture(scope="module")
def params():
    return m.init_params(jax.random.PRNGKey(0), DIMS, include_padding_token=False)


@pytest.fixture(scope="module")
def mel():
    return jax.random.normal(jax.random.PRNGKey(1), (2, 80, 3000)) * 0.5


def test_filter_config_suppress_list():
    tok = get_tokenizer(False)
    opts = decoding.DecodingOptions()
    cfg = decoding.build_filter_config(tok, opts, 1, DIMS.n_vocab)
    assert tok.sot in cfg.suppress
    assert tok.no_speech in cfg.suppress
    assert tok.transcribe in cfg.suppress
    assert all(t in cfg.suppress for t in tok.non_speech_tokens)


def test_apply_filters_first_step_forces_timestamp():
    tok = get_tokenizer(False)
    cfg = decoding.build_filter_config(
        tok, decoding.DecodingOptions(), 1, DIMS.n_vocab
    )
    logits = jnp.zeros((1, DIMS.n_vocab))
    tokens = jnp.full((1, 8), tok.eot, jnp.int32)
    out = decoding.apply_filters(logits, tokens, jnp.int32(0), cfg)
    out = np.asarray(out)
    # all text tokens masked at step 0; initial timestamps within 1.0s allowed
    assert np.all(np.isneginf(out[0, : tok.timestamp_begin]))
    assert not np.isneginf(out[0, tok.timestamp_begin])
    assert not np.isneginf(out[0, tok.timestamp_begin + 50])
    assert np.isneginf(out[0, tok.timestamp_begin + 51])  # > max_initial 1.0s


def test_apply_filters_after_two_timestamps():
    tok = get_tokenizer(False)
    cfg = decoding.build_filter_config(
        tok, decoding.DecodingOptions(), 1, DIMS.n_vocab
    )
    logits = jnp.zeros((1, DIMS.n_vocab))
    tokens = jnp.full((1, 8), tok.eot, jnp.int32)
    # sampled so far: <|0.50|> text <|1.00|> <|1.00|>
    seq = [tok.timestamp_begin + 25, 100, tok.timestamp_begin + 50,
           tok.timestamp_begin + 50]
    tokens = tokens.at[0, : len(seq)].set(jnp.asarray(seq))
    out = np.asarray(decoding.apply_filters(logits, tokens, jnp.int32(4), cfg))
    # after ts,ts: no timestamp may follow
    assert np.all(np.isneginf(out[0, tok.timestamp_begin:]))


def test_apply_filters_after_text_then_timestamp():
    tok = get_tokenizer(False)
    cfg = decoding.build_filter_config(
        tok, decoding.DecodingOptions(), 1, DIMS.n_vocab
    )
    logits = jnp.zeros((1, DIMS.n_vocab))
    tokens = jnp.full((1, 8), tok.eot, jnp.int32)
    seq = [tok.timestamp_begin, 100, tok.timestamp_begin + 50]
    tokens = tokens.at[0, : len(seq)].set(jnp.asarray(seq))
    out = np.asarray(decoding.apply_filters(logits, tokens, jnp.int32(3), cfg))
    # after text,ts: must close with another timestamp -> text masked
    assert np.all(np.isneginf(out[0, : tok.eot]))
    # monotonicity: earlier timestamps masked, same ts allowed
    assert np.isneginf(out[0, tok.timestamp_begin + 49])
    assert not np.isneginf(out[0, tok.timestamp_begin + 50])


def test_apply_filters_without_timestamps():
    tok = get_tokenizer(False)
    cfg = decoding.build_filter_config(
        tok, decoding.DecodingOptions(without_timestamps=True), 2, DIMS.n_vocab
    )
    logits = jnp.zeros((1, DIMS.n_vocab))
    tokens = jnp.full((1, 8), tok.eot, jnp.int32)
    out = np.asarray(decoding.apply_filters(logits, tokens, jnp.int32(1), cfg))
    assert np.all(np.isneginf(out[0, tok.timestamp_begin:]))


def test_greedy_decode_returns_results(params, mel):
    opts = decoding.DecodingOptions(
        language="en", without_timestamps=True, sample_len=8, fp16=False
    )
    results = decoding.decode(params, DIMS, mel, opts)
    assert len(results) == 2
    for r in results:
        assert isinstance(r, decoding.DecodingResult)
        assert r.temperature == 0.0
        assert all(t < DIMS.n_vocab for t in r.tokens)
        assert np.isfinite(r.avg_logprob)
        assert 0.0 <= r.no_speech_prob <= 1.0


def test_greedy_single_input(params, mel):
    opts = decoding.DecodingOptions(
        language="en", without_timestamps=True, sample_len=4, fp16=False
    )
    r = decoding.decode(params, DIMS, mel[0], opts)
    assert isinstance(r, decoding.DecodingResult)


def test_greedy_deterministic(params, mel):
    opts = decoding.DecodingOptions(
        language="en", without_timestamps=True, sample_len=6, fp16=False
    )
    r1 = decoding.decode(params, DIMS, mel, opts)
    r2 = decoding.decode(params, DIMS, mel, opts)
    assert [r.tokens for r in r1] == [r.tokens for r in r2]


def test_sampling_with_temperature(params, mel):
    opts = decoding.DecodingOptions(
        language="en", without_timestamps=True, sample_len=6, temperature=0.8,
        best_of=2, fp16=False,
    )
    results = decoding.decode(params, DIMS, mel, opts)
    assert len(results) == 2
    assert results[0].temperature == 0.8


def test_beam_decode(params, mel):
    opts = decoding.DecodingOptions(
        language="en", without_timestamps=True, sample_len=6, beam_size=2, fp16=False
    )
    results = decoding.decode(params, DIMS, mel, opts)
    assert len(results) == 2
    for r in results:
        assert np.isfinite(r.avg_logprob)


def test_beam_better_or_equal_logprob(params, mel):
    """Beam search's selected hypothesis should score >= greedy's."""
    greedy = decoding.decode(
        params, DIMS, mel,
        decoding.DecodingOptions(language="en", without_timestamps=True,
                                 sample_len=6, fp16=False),
    )
    beam = decoding.decode(
        params, DIMS, mel,
        decoding.DecodingOptions(language="en", without_timestamps=True,
                                 sample_len=6, beam_size=4, fp16=False),
    )
    for g, b in zip(greedy, beam):
        # compare total logprob normalized the same way
        g_total = g.avg_logprob * (len(g.tokens) + 1)
        b_total = b.avg_logprob * (len(b.tokens) + 1)
        assert b_total >= g_total - 1e-3


def test_detect_language(params, mel):
    toks, probs = decoding.detect_language(params, DIMS, mel[0])
    assert isinstance(probs, dict)
    assert len(probs) == 99
    assert abs(sum(probs.values()) - 1.0) < 1e-3


def test_compression_ratio():
    assert decoding.compression_ratio("") == 0.0
    rep = decoding.compression_ratio("hello hello hello hello hello hello")
    uniq = decoding.compression_ratio("the quick brown fox jumps over lazy dog")
    assert rep > uniq


def test_beam_patience_pool(params, mel):
    """patience > 1 keeps a larger finished pool (max_candidates = K*patience)."""
    opts = decoding.DecodingOptions(
        language="en", without_timestamps=True, sample_len=6, beam_size=2,
        patience=2.0, fp16=False,
    )
    results = decoding.decode(params, DIMS, mel, opts)
    assert len(results) == 2
    for r in results:
        assert np.isfinite(r.avg_logprob)


def test_logger_table(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from olmoasr_tpu.training.logging_utils import MetricsLogger, TRAIN_TABLE_COLS

    lg = MetricsLogger("t", log_dir=str(tmp_path), use_wandb=False)
    lg.log_table(
        "train_examples", ["step", "audio", "pred"],
        [[1, np.zeros(100, np.float32), "hi"]], step=1, audio_cols=["audio"],
    )
    lg.close()
    content = (tmp_path / "t_metrics.jsonl").read_text()
    assert "train_examples" in content and "hi" in content
    assert len(TRAIN_TABLE_COLS) == 8


def test_multilingual_decode_end_to_end():
    """A multilingual-shaped model (n_vocab 51865) decodes with the
    multilingual special-token layout: SOT sequence = sot + language + task,
    and detect_language returns a distribution over the 99 language tokens
    ([pip:whisper] decoding.detect_language semantics)."""
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=1,
    )
    params = m.init_params(jax.random.PRNGKey(0), dims, include_padding_token=False)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 80, 3000)) * 0.5

    tok = get_tokenizer(multilingual=True, language="de", task="transcribe")
    assert list(tok.sot_sequence) == [50258, tok.language_token, 50359]

    r = decoding.decode(
        params, dims, mel[0],
        decoding.DecodingOptions(
            language="de", task="transcribe", without_timestamps=True,
            fp16=False, sample_len=8,
        ),
    )
    assert isinstance(r, decoding.DecodingResult)
    assert r.language == "de"
    # every sampled token must be below the multilingual eot/special block
    # or a legal text token; specials were suppressed by the filters
    assert all(t < 51865 for t in r.tokens)

    lang_tok, probs = decoding.detect_language(params, dims, mel[0], tok)
    assert int(lang_tok) in set(tok.all_language_tokens)
    assert len(probs) == len(tok.all_language_codes)
    assert abs(sum(probs.values()) - 1.0) < 1e-3
