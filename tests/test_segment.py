"""Segmentation engine tests: the behavioral contract of preprocess.py's
chunk_data (30s windows, gaps, token budget, counters)."""

import numpy as np
import pytest

from olmoasr_tpu.data.segment import (
    SEGMENT_COUNT_THRESHOLD,
    SegmentCounter,
    chunk_data,
    token_budget,
)
from olmoasr_tpu.tokenizer import get_tokenizer


def ts(ms):
    from olmoasr_tpu.utils import convert_to_timestamp

    return convert_to_timestamp(ms)


def make_transcript(cues):
    return {(ts(s), ts(e)): text for s, e, text in cues}


def test_simple_two_segments():
    # 4 cues, 14s each: fits two per 30s window
    t = make_transcript([
        (0, 14_000, "one"), (14_000, 28_000, "two"),
        (28_000, 42_000, "three"), (42_000, 56_000, "four"),
    ])
    segs, counter = chunk_data(t, video_id="v")
    assert counter.segment_count == len(segs) == 2
    # norm_end is a rebased timestamp STRING (reference write_segment)
    assert segs[0].norm_end == "00:00:28.000"
    # second segment starts at the end of the first's last cue
    assert segs[0].audio_timestamp.startswith("00:00:00,000")
    assert segs[1].audio_timestamp.startswith("00:00:28,000")
    assert segs[1].norm_end == "00:00:28.000"
    assert "three" in segs[1].seg_content


def test_over_30s_single_cue_skipped():
    # the >30s cue is dropped; the trailing cue is then the transcript-end
    # anchor exclusion case (reference preprocess.py final-segment quirk:
    # timestamps[a+1:b] is empty -> counted over_ctx, nothing emitted)
    t = make_transcript([(0, 31_000, "too long"), (31_000, 35_000, "ok")])
    segs, counter = chunk_data(t, video_id="v")
    assert counter.over_30_line_segment_count == 1
    assert counter.over_ctx_len_segment_count == 1
    assert len(segs) == 0


def test_long_gap_emits_empty_segments():
    t = make_transcript([
        (0, 5_000, "speech"), (70_000, 75_000, "more"),
    ])
    segs, counter = chunk_data(t, video_id="v")
    # gap 5s..70s = 65s -> two full 30s empty segments (5-35, 35-65); the
    # remaining 5s of silence starts the final segment's window at 65s
    assert len(segs) == 4  # speech, empty, empty, final
    assert segs[1].norm_end == 30_000 and segs[2].norm_end == 30_000  # ints
    assert segs[3].audio_timestamp.startswith("00:01:05,000")  # starts at 65s
    assert "more" in segs[3].seg_content
    # the final segment carries ALL transcript text (reference selection is
    # timestamps[a:b] with a==0) with pre-window cues flagged only_no_ts
    assert segs[3].only_no_ts_mode is True


def test_token_budget_modes():
    tok = get_tokenizer(False)
    small = [(0, 1000, "hi there")]
    b = token_budget(small, tok)
    assert b["ts_mode"] and b["no_ts_mode"]
    # enormous text: neither mode fits
    huge = [(0, 1000, "word " * 600)]
    b2 = token_budget(huge, tok)
    assert not b2["ts_mode"] and not b2["no_ts_mode"]
    # many cues with long text: ts-mode can overflow while no-ts fits
    many = [(i * 100, i * 100 + 90, "hello there my friend " * 4) for i in range(22)]
    b3 = token_budget(many, tok)
    assert b3["num_tokens_ts_mode"] > b3["num_tokens_no_ts_mode"]


def test_segment_count_threshold():
    cues = [(i * 31_000, i * 31_000 + 29_000, f"cue {i}") for i in range(200)]
    t = make_transcript(cues)
    segs, counter = chunk_data(t, video_id="v")
    assert counter.segment_count <= SEGMENT_COUNT_THRESHOLD


def test_audio_windows_are_30s():
    sr = 16000
    wav = (np.random.default_rng(0).standard_normal(sr * 40) * 1000).astype(np.int16)
    t = make_transcript([
        (0, 10_000, "a"), (10_000, 20_000, "b"), (20_000, 40_000, "c"),
    ])
    segs, counter = chunk_data(t, audio=wav, video_id="v")
    # cues a+b close the first window when c overflows it; that segment's
    # audio is the fixed 30s window [0, 30s)
    assert len(segs) >= 1
    assert segs[0].audio_arr is not None
    assert len(segs[0].audio_arr) == 30 * sr
    assert segs[0].audio_arr.dtype == np.int16


def test_jsonl_row_schema():
    t = make_transcript([(0, 5_000, "text")])
    segs, _ = chunk_data(t, video_id="vid1")
    d = segs[0].to_dict()
    for key in (
        "subtitle_file", "seg_content", "text_timestamp", "audio_timestamp",
        "norm_end", "id", "seg_id", "audio_file", "ts_mode", "no_ts_mode",
        "only_no_ts_mode", "num_tokens_no_ts_mode", "num_tokens_ts_mode",
    ):
        assert key in d
    assert d["seg_id"] == "vid1_0"
