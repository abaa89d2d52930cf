"""Tokenizer tests: special-token layout (the load-bearing contract for the
model/decoder), BPE engine mechanics, round-trips."""

import numpy as np
import pytest

from olmoasr_tpu import tokenizer as tok


def test_special_token_layout():
    t = tok.get_tokenizer(False)
    assert t.eot == 50256
    assert t.sot == 50257
    assert t.translate == 50357
    assert t.transcribe == 50358
    assert t.sot_lm == 50359
    assert t.sot_prev == 50360
    assert t.no_speech == 50361
    assert t.no_timestamps == 50362
    assert t.timestamp_begin == 50363
    assert t.to_id("<|30.00|>") == 51863
    assert t.encoding.n_vocab == 51864
    assert tok.PADDING_TOKEN == 51864


def test_sot_sequences():
    t = tok.get_tokenizer(False)
    assert t.sot_sequence == (t.sot,)
    assert t.sot_sequence_including_notimestamps == (t.sot, t.no_timestamps)


def test_language_tokens():
    t = tok.get_tokenizer(False)
    assert len(t.all_language_tokens) == 99
    assert t.all_language_tokens[0] == 50258  # <|en|>
    assert t.all_language_tokens[-1] == 50356  # <|su|>
    assert len(tok.LANGUAGES) == 99


def test_encode_decode_roundtrip():
    t = tok.get_tokenizer(False)
    for text in [" hello world", " The quick brown fox.", "", " 123 !?"]:
        ids = t.encode(text)
        assert t.decode(ids) == text
        assert all(i < t.encoding.n_base_vocab for i in ids)


def test_decode_strips_timestamps():
    t = tok.get_tokenizer(False)
    ids = [t.timestamp_begin] + t.encode(" hi") + [t.timestamp_begin + 100]
    assert t.decode(ids) == " hi"
    with_ts = t.decode_with_timestamps(ids)
    assert with_ts.startswith("<|0.00|>")
    assert with_ts.endswith("<|2.00|>")


def test_timestamp_token_semantics():
    t = tok.get_tokenizer(False)
    # 20ms per token: <|x.xx|> for x = 0.02 * (id - begin)
    assert t.decode_with_timestamps([t.timestamp_begin + 50]) == "<|1.00|>"


def test_bpe_engine_with_synthetic_ranks():
    """The merge loop must follow lowest-rank-first, like tiktoken."""
    ranks = {bytes([b]): b for b in range(256)}
    ranks[b"ab"] = 256
    ranks[b"abc"] = 257
    ranks[b"bc"] = 258
    enc = tok.BytePairEncoder(ranks, {})
    # "abc": merge ab (rank 256) first -> [ab, c], then ab+c=abc (257) -> [abc]
    assert enc._bpe_merge(b"abc") == [257]
    assert enc._bpe_merge(b"abx") == [256, ord("x")]


def test_non_speech_tokens_nonempty():
    t = tok.get_tokenizer(False)
    ns = t.non_speech_tokens
    assert len(ns) > 0
    assert all(i < t.eot for i in ns)


def test_split_tokens_on_spaces():
    t = tok.get_tokenizer(False)
    ids = t.encode(" hello world again")
    words, word_tokens = t.split_tokens_on_spaces(list(ids))
    assert words == [" hello", " world", " again"]
    assert sum(word_tokens, []) == list(ids)


def test_multilingual_special_layout():
    """Whisper multilingual ids: eot 50257, sot 50258, langs from 50259,
    transcribe 50359, timestamps from 50364, n_vocab 51865."""
    from olmoasr_tpu.tokenizer import get_tokenizer

    t = get_tokenizer(True, language="en", task="transcribe")
    assert t.eot == 50257
    assert t.sot == 50258
    assert t.language_token == 50259  # <|en|>
    assert t.transcribe == 50360 - 1  # <|transcribe|> = 50359
    assert t.timestamp_begin == 50364
    assert t.encoding.n_vocab == 51865
    assert t.sot_sequence == (50258, 50259, 50359)
