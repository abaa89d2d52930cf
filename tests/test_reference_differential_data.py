"""Differential: reference data-pipeline logic vs our rebuild (no egress).

The reference's tagging, filtering, and segmentation code is pure Python, so
it runs directly here (tests/ref_loader.py) and pins our counterparts on the
same synthetic inputs — converting the "faithful rebuild" docstrings in
data/tagging.py, data/filtering.py, and data/segment.py into executable
proofs. Complements test_reference_differential.py (token building) and
test_reference_differential_model.py (model forward).

Reference anchors: scripts/data/filtering/data_tagger.py:440-700 (tag
functions), process_tagged_data.py:223-347 (filter + clean rules),
olmoasr/preprocess.py:30-845 (chunk_data two-pointer machine).
"""

from __future__ import annotations

import random

import pytest

torch = pytest.importorskip("torch")  # ref_loader stubs expect full env

from tests.ref_loader import load_reference

from olmoasr_tpu.data import filtering as our_filter
from olmoasr_tpu.data import segment as our_segment
from olmoasr_tpu.data import tagging as our_tagging


class _Cap:
    __slots__ = ("text",)

    def __init__(self, text: str):
        self.text = text


WORDS = [
    "the", "quick", "brown", "fox", "jumps", "OVER", "Lazy", "dog", "HELLO",
    "world", "And", "then", "some", "MORE", "words", "here",
]
PUNCT = ["", ".", ",", "!", "?", "..."]


def _random_caps(rng: random.Random, n: int) -> list:
    caps = []
    for _ in range(n):
        k = rng.randint(0, 6)
        text = " ".join(rng.choice(WORDS) for _ in range(k)) + rng.choice(PUNCT)
        if rng.random() < 0.15:
            text = text.upper()
        elif rng.random() < 0.15:
            text = text.lower()
        if caps and rng.random() < 0.2:
            # embed the previous caption to exercise the repeat detector
            text = caps[-1].text + " " + text
        caps.append(_Cap(text))
    return caps


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def test_tag_functions_match_reference_fuzz(ref):
    rng = random.Random(0)
    for trial in range(200):
        caps = _random_caps(rng, rng.randint(0, 8))
        cues = [our_tagging.Cue(c.text) for c in caps]
        cd = {"content_iter": caps, "length": 30.0}
        assert (
            ref.tagger.analyze_text_casing(dict(cd))[0]
            == our_tagging.tag_casing(cues)
        ), f"casing trial {trial}: {[c.text for c in caps]}"
        assert (
            ref.tagger.check_comma_period_presence(dict(cd))[0]
            == our_tagging.tag_has_comma_period(cues)
        ), f"comma/period trial {trial}"
        assert (
            ref.tagger.detect_repeating_lines(dict(cd))[0]
            == our_tagging.tag_repeating_lines(cues)
        ), f"repeat trial {trial}: {[c.text for c in caps]}"
        assert (
            ref.tagger.check_proper_capitalization(dict(cd))[0]
            == our_tagging.tag_proper_capitalization(cues)
        ), f"caps trial {trial}: {[c.text for c in caps]}"
        assert (
            ref.tagger.count_words(dict(cd))[0]
            == our_tagging.tag_num_words(cues)
        ), f"words trial {trial}"


def test_filter_primitives_match_reference_fuzz(ref):
    rng = random.Random(1)
    for _ in range(300):
        v = rng.choice([rng.uniform(-5, 5), rng.randint(-3, 3)])
        lo = rng.choice([None, rng.uniform(-4, 4)])
        hi = rng.choice([None, rng.uniform(-4, 4)])
        want = ref.filter.apply_numeric_filter(v, lo, hi, inclusive=True)
        got = our_filter.FilterRule(tag="x", bounds=(lo, hi)).passes(v)
        assert want == got, (v, lo, hi)

    for _ in range(100):
        val = rng.choice(["en", "es", "de", "mixed", "upper"])
        refvals = rng.sample(["en", "es", "de", "mixed", "upper"], rng.randint(1, 3))
        assert ref.filter.apply_categorical_filter(
            val, refvals, "in"
        ) == our_filter.FilterRule(tag="x", values=tuple(refvals)).passes(val)
        assert ref.filter.apply_categorical_filter(
            val, refvals, "not_in"
        ) == our_filter.FilterRule(tag="x", not_values=tuple(refvals)).passes(val)

    for a in (True, False):
        for b in (True, False):
            assert ref.filter.apply_boolean_filter(a, b) == our_filter.FilterRule(
                tag="x", ref_value=b
            ).passes(a)


def test_clean_subtitle_text_matches_reference(ref, monkeypatch):
    """Speaker-label / HTML-entity cleaning: compare the cleaned cue TEXTS
    (serialization formats differ — the reference round-trips through webvtt,
    stubbed here — but the cue content is what training sees)."""
    from olmoasr_tpu.data.transcripts import TranscriptReader

    monkeypatch.setattr(
        ref.filter, "serialize_subtitle_content",
        lambda caps: "\n".join(c.text for c in caps),
    )
    vtt = (
        "WEBVTT\n\n"
        "00:00:00.000 --> 00:00:02.000\nJohn Smith: hello &nbsp; world\n\n"
        "00:00:02.000 --> 00:00:04.000\nplain text ... with = artifacts\n\n"
        "00:00:04.000 --> 00:00:06.000\nuntouched line\n"
    )
    ref_out, ref_mod = ref.filter.clean_subtitle_text(vtt)
    our_out, our_mod = our_filter.clean_seg_content(vtt)
    assert ref_mod == our_mod == 1

    t, _, _ = TranscriptReader(transcript_string=our_out, ext="vtt").read()
    ours = [" ".join(x.split()) for x in t.values()]
    refs = [" ".join(x.split()) for x in ref_out.splitlines()]
    assert refs == ours


# ---------------------------------------------------------------------------
# segmentation (preprocess.chunk_data)
# ---------------------------------------------------------------------------


def _ts(ms: int) -> str:
    h, rem = divmod(ms, 3600_000)
    m, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}.{milli:03d}"


def _transcript(cues):
    return {(_ts(a), _ts(b)): t for a, b, t in cues}


SEG_CASES = {
    "simple_two_windows": [
        (0, 4_000, "hello there"),
        (4_000, 29_000, "first window tail"),
        (29_500, 40_000, "second window text"),
        (41_000, 55_000, "more text"),
    ],
    "long_no_speech_gap": [
        (0, 5_000, "before the gap"),
        (80_000, 85_000, "after a 75s silence"),
        (86_000, 90_000, "tail"),
    ],
    "overlong_single_cue": [
        (0, 35_000, "a single cue longer than thirty seconds"),
        (36_000, 40_000, "short one"),
    ],
    "dense_many_cues": [
        (i * 2_000, i * 2_000 + 1_800, f"cue number {i}") for i in range(40)
    ],
    "zero_length_cue": [
        (0, 0, "instant"),
        (1_000, 8_000, "normal cue"),
        (8_000, 20_000, "another"),
    ],
}


def _random_transcript(rng: random.Random):
    """Random cue streams exercising gaps, overlaps-with-window, long cues,
    zero-length cues, and dense runs."""
    cues = []
    t = rng.randint(0, 2_000)
    for _ in range(rng.randint(1, 30)):
        gap = rng.choice([0, 0, rng.randint(1, 2_000), rng.randint(2_000, 40_000)])
        # no zero-duration cues: a zero-length cue followed by a cue whose end
        # is >30s past it livelocks the REFERENCE machine (state repeats with
        # only over_ctx_len_segment_count growing, preprocess.py:633-640) —
        # and therefore our faithful port too; real VTT cues have duration
        dur = rng.choice(
            [rng.randint(200, 4_000), rng.randint(4_000, 29_000),
             rng.randint(29_000, 40_000)]
        )
        start = t + gap
        end = start + dur
        k = rng.randint(0, 8)
        text = " ".join(rng.choice(WORDS) for _ in range(k))
        cues.append((start, end, text))
        t = end
    return cues


def test_chunk_data_matches_reference_fuzz(ref):
    rng = random.Random(7)
    for trial in range(60):
        cues = _random_transcript(rng)
        tr = _transcript(cues)
        ref_segments, ref_counter = ref.preprocess.chunk_data(
            tr, "vtt", transcript_only=True, in_memory=True, video_id="vid"
        )
        our_segments, our_counter = our_segment.chunk_data(
            tr, transcript_ext="vtt", transcript_only=True, in_memory=True,
            video_id="vid",
        )
        ref_segments = ref_segments or []
        assert len(ref_segments) == len(our_segments), (trial, cues)
        for rs, os_ in zip(ref_segments, our_segments):
            assert rs.text_timestamp == os_.text_timestamp, (trial, cues)
            assert rs.audio_timestamp == os_.audio_timestamp, (trial, cues)
            assert rs.norm_end == os_.norm_end, (trial, cues)
            assert rs.seg_content == os_.seg_content, (trial, cues)
            assert rs.only_no_ts_mode == os_.only_no_ts_mode, (trial, cues)
            assert rs.num_tokens_ts_mode == os_.num_tokens_ts_mode, (trial, cues)
        assert ref_counter.to_dict() == {
            k: getattr(our_counter, k) for k in ref_counter.to_dict()
        }, (trial, cues)


@pytest.mark.parametrize("name", sorted(SEG_CASES))
def test_chunk_data_matches_reference(ref, name):
    cues = SEG_CASES[name]
    ref_segments, ref_counter = ref.preprocess.chunk_data(
        _transcript(cues), "vtt", transcript_only=True, in_memory=True,
        video_id="vid",
    )
    our_segments, our_counter = our_segment.chunk_data(
        _transcript(cues), transcript_ext="vtt", transcript_only=True,
        in_memory=True, video_id="vid",
    )
    ref_segments = ref_segments or []
    assert len(ref_segments) == len(our_segments), (
        name,
        [getattr(s, "text_timestamp", s) for s in ref_segments],
        [s.text_timestamp for s in our_segments],
    )
    for rs, os_ in zip(ref_segments, our_segments):
        assert rs.text_timestamp == os_.text_timestamp, name
        assert rs.audio_timestamp == os_.audio_timestamp, name
        assert rs.norm_end == os_.norm_end, name  # dual-typed: str or int
        assert rs.seg_content == os_.seg_content, name
        assert rs.ts_mode == os_.ts_mode, name
        assert rs.no_ts_mode == os_.no_ts_mode, name
        assert rs.only_no_ts_mode == os_.only_no_ts_mode, name
        assert rs.num_tokens_ts_mode == os_.num_tokens_ts_mode, name
        assert rs.num_tokens_no_ts_mode == os_.num_tokens_no_ts_mode, name
    for field in (
        "segment_count", "over_30_line_segment_count", "bad_text_segment_count",
        "over_ctx_len_segment_count", "faulty_audio_segment_count",
        "failed_transcript_count",
    ):
        assert getattr(ref_counter, field) == getattr(our_counter, field), (
            name, field,
        )
