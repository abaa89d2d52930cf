"""Dataset tests: transcript parsing, token building (ts vs no-ts modes, empty,
>30s), padding/mask contract, loader sharding."""

import numpy as np
import pytest

from olmoasr_tpu.data.transcripts import TranscriptReader
from olmoasr_tpu.models.whisper import PADDING_TOKEN
from olmoasr_tpu.tokenizer import get_tokenizer
from olmoasr_tpu.training.dataset import (
    AudioTextDataset,
    BatchLoader,
    Sample,
    build_tokens,
    convert_to_token_idx,
)

VTT = """WEBVTT

00:00:00.000 --> 00:00:02.500
hello world

00:00:02.500 --> 00:00:05.000
second cue text
"""

SRT = """1
00:00:00,000 --> 00:00:02,500
hello world

2
00:00:02,500 --> 00:00:05,000
second cue text
"""


def test_transcript_reader_vtt_and_srt():
    for content, ext in ((VTT, "vtt"), (SRT, "srt")):
        t, start, end = TranscriptReader(transcript_string=content, ext=ext).read()
        assert list(t.values()) == ["hello world", "second cue text"]
        assert start == "00:00:00.000"
        assert end == "00:00:05.000"


def test_convert_to_token_idx():
    tok = get_tokenizer(False)
    assert convert_to_token_idx(0, tok.timestamp_begin) == tok.timestamp_begin
    assert convert_to_token_idx("00:00:01.000", tok.timestamp_begin) == (
        tok.timestamp_begin + 50
    )
    assert convert_to_token_idx(30000, tok.timestamp_begin) == tok.timestamp_begin + 1500
    assert convert_to_token_idx(30001, tok.timestamp_begin) is None


def test_build_tokens_timestamp_mode():
    tok = get_tokenizer(False)
    t, _, _ = TranscriptReader(transcript_string=VTT, ext="vtt").read()
    # force the ts branch by controlling the rng
    rng = np.random.default_rng(0)
    found_ts = found_nots = False
    for seed in range(20):
        tokens, ts_mode, norm_end = build_tokens(
            t, tok, 5000, rng=np.random.default_rng(seed)
        )
        if ts_mode:
            found_ts = True
            assert tokens[0] == tok.sot
            assert tokens[1] == tok.timestamp_begin  # <|0.00|>
            assert tokens[-1] == tok.eot
            assert tokens[-2] == tok.timestamp_begin + 250  # <next> = 5.0s
            # structure: ts text ts ts text ts next eot
            ts_positions = [i for i, x in enumerate(tokens) if x >= tok.timestamp_begin]
            assert len(ts_positions) == 5  # t0 t1 t2 t3 next
        else:
            found_nots = True
            assert tokens[:2] == [tok.sot, tok.no_timestamps]
            assert tokens[-1] == tok.eot
    assert found_ts and found_nots  # both modes hit over 20 seeds (50% coin)


def test_build_tokens_empty_transcript():
    tok = get_tokenizer(False)
    # >= 30s empty: no_speech path
    tokens, _, _ = build_tokens({}, tok, 31000, rng=np.random.default_rng(0))
    assert tokens == list(tok.sot_sequence_including_notimestamps) + [tok.no_speech, tok.eot]
    # < 30s: either empty-ts or empty-nots
    tokens, _, _ = build_tokens({}, tok, 2000, only_no_ts_mode=True,
                                rng=np.random.default_rng(0))
    assert tokens == list(tok.sot_sequence_including_notimestamps) + [tok.eot]


def test_build_tokens_over_30s_truncates():
    tok = get_tokenizer(False)
    t = {
        ("00:00:00.000", "00:00:02.000"): "first",
        ("00:00:02.000", "00:00:35.000"): "overlong",
    }
    tokens, ts_mode, norm_end = build_tokens(t, tok, 35000,
                                             rng=np.random.default_rng(0))
    assert ts_mode is False  # forced no-ts
    assert norm_end == 2000  # truncated to the end of the remaining segment
    text = tok.decode([x for x in tokens if x < tok.eot])
    assert "overlong" not in text
    assert "first" in text


def test_dataset_item_contract():
    wav = (np.sin(np.arange(16000 * 3) / 16000 * 2 * np.pi * 220) * 10000).astype(
        np.int16
    )
    ds = AudioTextDataset(
        [Sample(audio=wav, transcript=VTT, transcript_ext="vtt", norm_end=5000)],
        n_text_ctx=448,
    )
    item = ds[0]
    assert item["mel"].shape == (80, 3000)
    assert item["text_input"].shape == (448,)
    assert item["text_target"].shape == (448,)
    assert item["padding_mask"].shape == (448,)
    # teacher forcing shift
    n_valid = int((item["text_input"] != PADDING_TOKEN).sum())
    np.testing.assert_array_equal(
        item["text_input"][1:n_valid], item["text_target"][: n_valid - 1]
    )
    # mask −inf exactly beyond the valid region
    assert np.all(item["padding_mask"][:n_valid] == 0)
    assert np.all(np.isneginf(item["padding_mask"][n_valid:]))


def test_batch_loader_shapes_and_sharding():
    wav = np.zeros(16000, np.int16)
    samples = [
        Sample(audio=wav, transcript=VTT, transcript_ext="vtt", norm_end=3000)
        for _ in range(16)
    ]
    ds = AudioTextDataset(samples)
    loader = BatchLoader(ds, micro_batch_size=2, accum_steps=2, shuffle=True)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["mel"].shape == (2, 2, 80, 3000)
    # host sharding: two shards see disjoint strided subsets
    l0 = BatchLoader(ds, 2, 1, shard_id=0, num_shards=2)
    l1 = BatchLoader(ds, 2, 1, shard_id=1, num_shards=2)
    i0, i1 = set(l0._indices().tolist()), set(l1._indices().tolist())
    assert i0.isdisjoint(i1)
    assert len(i0 | i1) == 16


def test_batch_loader_prefetch_equivalence():
    """Background-prefetch batches == synchronous batches, and breaking out
    of a prefetching iterator doesn't wedge subsequent epochs."""
    wav = np.zeros(16000, np.int16)
    samples = [
        Sample(audio=wav, transcript=VTT, transcript_ext="vtt", norm_end=3000)
        for _ in range(12)
    ]
    ds = AudioTextDataset(samples)
    sync = list(BatchLoader(ds, 2, 1, shuffle=True, prefetch=0))
    pre = list(BatchLoader(ds, 2, 1, shuffle=True, prefetch=2))
    assert len(sync) == len(pre) == 6
    for a, b in zip(sync, pre):
        for k in a:
            assert np.array_equal(a[k], b[k]), k
    # early break, then a fresh epoch over the same loader
    loader = BatchLoader(ds, 2, 1, shuffle=True, prefetch=2)
    it = iter(loader)
    next(it)
    del it
    loader.set_epoch(1)
    assert len(list(loader)) == 6


def test_batch_loader_prefetch_propagates_errors():
    class Boom(AudioTextDataset):
        def __getitem__(self, i):
            raise RuntimeError("boom")

    wav = np.zeros(16000, np.int16)
    samples = [
        Sample(audio=wav, transcript=VTT, transcript_ext="vtt", norm_end=3000)
        for _ in range(4)
    ]
    ds = Boom(samples)
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        list(BatchLoader(ds, 2, 1, prefetch=2))


def test_yodas_dataset():
    from olmoasr_tpu.training.dataset import YodasDataset

    wav = np.zeros(16000 * 6, np.float32)
    rows = [{
        "audio": wav,
        "text": ["first utterance", "second utterance"],
        "ts": [[0.0, 2.5], [2.5, 5.0]],
        "utt_id": "y0",
        "dur": 5.0,
    }]
    ds = YodasDataset(rows)
    item = ds[0]
    assert item["mel"].shape == (80, 3000)
    n_valid = int((item["text_input"] != PADDING_TOKEN).sum())
    assert n_valid > 4


def test_timestamp_mode_coin_flips_across_epochs():
    """The ts/no-ts coin is per VISIT (reference: random.random() inside
    __getitem__, train_timestamps.py:427-463) — a (seed, index)-only rng
    froze each sample into one mode for the whole run (r5 convergence-proof
    find). Over epochs a sample must train in BOTH modes, deterministically
    per (seed, epoch, index) so resume replays identically."""
    wav = (np.sin(np.arange(16000 * 3) / 16000 * 2 * np.pi * 220) * 10000).astype(
        np.int16
    )
    ds = AudioTextDataset(
        [Sample(audio=wav, transcript=VTT, transcript_ext="vtt", norm_end=5000)],
        n_text_ctx=448,
    )
    modes = []
    for epoch in range(16):
        ds.set_epoch(epoch) if hasattr(ds, "set_epoch") else setattr(
            ds, "epoch", epoch
        )
        ds.epoch = epoch
        modes.append(bool(ds[0]["timestamp_mode"]))
    assert any(modes) and not all(modes), f"mode never flips across epochs: {modes}"
    # determinism for resume: same (seed, epoch, index) -> same draw
    ds.epoch = 3
    a = ds[0]["timestamp_mode"]
    b = ds[0]["timestamp_mode"]
    assert a == b
    assert modes[3] == bool(a)


def test_batch_loader_set_epoch_propagates_to_dataset():
    wav = (np.sin(np.arange(16000 * 3) / 16000 * 2 * np.pi * 220) * 10000).astype(
        np.int16
    )
    ds = AudioTextDataset(
        [Sample(audio=wav, transcript=VTT, transcript_ext="vtt", norm_end=5000)] * 4,
        n_text_ctx=448,
    )
    loader = BatchLoader(ds, micro_batch_size=2, accum_steps=1, num_workers=0)
    loader.set_epoch(7)
    assert ds.epoch == 7
