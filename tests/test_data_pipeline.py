"""Tagging / filtering / sampling / jsonl pipeline tests."""

import gzip
import json
import os

import numpy as np
import pytest

from olmoasr_tpu.data import filtering, jsonl as jsonl_mod, sampling, tagging

VTT = """WEBVTT

00:00:00.000 --> 00:00:02.000
Hello there, my friend.

00:00:02.000 --> 00:00:04.000
This is mixed case text.
"""

VTT_UPPER = """WEBVTT

00:00:00.000 --> 00:00:02.000
ALL SHOUTING HERE

00:00:02.000 --> 00:00:04.000
STILL SHOUTING
"""

VTT_REPEAT = """WEBVTT

00:00:00.000 --> 00:00:02.000
the same line here

00:00:02.000 --> 00:00:04.000
the same line here again
"""


def row(content, **kw):
    return {"id": "v", "seg_content": content, "norm_end": 4000, "ext": "vtt", **kw}


def test_tag_casing_and_punctuation():
    r = tagging.apply_tags(row(VTT), ["casing", "has_comma_period", "num_words"])
    assert r["casing"] == "mixed"
    assert r["has_comma_period"] is True
    assert r["num_words"] == 9
    r2 = tagging.apply_tags(row(VTT_UPPER), ["casing", "has_comma_period"])
    assert r2["casing"] == "upper"
    assert r2["has_comma_period"] is False


def test_tag_repeating_lines():
    assert tagging.apply_tags(row(VTT_REPEAT), ["repeating_lines"])["repeating_lines"]
    assert not tagging.apply_tags(row(VTT), ["repeating_lines"])["repeating_lines"]


def test_tag_proper_capitalization():
    bad = VTT.replace("This is", "this is")
    assert tagging.apply_tags(row(VTT), ["has_proper_cap_after_punct_line"])[
        "has_proper_cap_after_punct_line"
    ]
    assert not tagging.apply_tags(row(bad), ["has_proper_cap_after_punct_line"])[
        "has_proper_cap_after_punct_line"
    ]


def test_tag_edit_dist():
    r = row(VTT, man_text="hello world", mach_text="hello world")
    assert tagging.tag_edit_dist(r) == 0.0
    r2 = row(VTT, man_text="hello world", mach_text="goodbye world")
    assert 0 < tagging.tag_edit_dist(r2) <= 1.0


def test_text_language_detection():
    assert tagging.detect_text_language(
        "the quick brown fox is in the barn and it was not alone"
    ) == "en"
    assert tagging.detect_text_language("这是一段中文文本内容测试") == "zh"
    assert tagging.detect_text_language("это русский текст для теста") == "ru"
    assert tagging.detect_text_language("") == "un"


def test_filter_rules():
    rules = [
        filtering.FilterRule(tag="casing", values=("mixed",)),
        filtering.FilterRule(tag="edit_dist", bounds=(None, 0.5)),
        filtering.FilterRule(tag="has_comma_period", ref_value=True),
    ]
    ok = {"casing": "mixed", "edit_dist": 0.3, "has_comma_period": True}
    keep, failed = filtering.filter_row(ok, rules)
    assert keep and failed is None
    bad = dict(ok, edit_dist=0.9)
    keep, failed = filtering.filter_row(bad, rules)
    assert not keep and failed == "edit_dist"


def test_clean_seg_content():
    content = "WEBVTT\n\n00:00:00.000 --> 00:00:02.000\nJohn : hello &nbsp; world\n"
    cleaned, changed = filtering.clean_seg_content(content)
    assert changed == 1
    assert "&nbsp;" not in cleaned
    assert "John :" not in cleaned
    assert "00:00:00.000 --> 00:00:02.000" in cleaned


def test_end_to_end_tag_then_filter(tmp_path):
    shard = tmp_path / "shard.jsonl.gz"
    rows = [
        row(VTT, man_text="hello there my friend this is mixed case text",
            mach_text="hello there my friend this is mixed case text"),
        row(VTT_UPPER, man_text="all shouting here", mach_text="different words"),
    ]
    with gzip.open(shard, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    tag_dir = tmp_path / "tagged"
    stats = tagging.process_jsonl_file(str(shard), str(tag_dir), ["casing", "edit_dist"])
    assert stats["rows"] == 2

    cfg = tmp_path / "filter.yaml"
    cfg.write_text(
        "filters:\n"
        "  - tag: casing\n    values: [mixed]\n"
        "  - tag: edit_dist\n    bounds: [0, 0.5]\n"
    )
    out_dir = tmp_path / "filtered"
    report = filtering.main(
        [str(tag_dir / "shard.jsonl.gz")], str(out_dir), str(cfg)
    )
    assert report["rows"] == 2
    assert report["kept"] == 1
    assert report["filter_hitlist"].get("casing") == 1


def test_reservoir_percentiles(tmp_path):
    shard = tmp_path / "s.jsonl"
    with open(shard, "w") as f:
        for i in range(1000):
            f.write(json.dumps({"edit_dist": i / 1000}) + "\n")
    table = sampling.main([str(shard)], "edit_dist", k_per_shard=500)
    assert table["n"] == 500
    assert 0.35 < table["p50"] < 0.65


def test_text_to_jsonl(tmp_path):
    d = tmp_path / "transcripts"
    d.mkdir()
    (d / "vid1.vtt").write_text(VTT)
    (d / "vid2.srt").write_text(
        "1\n00:00:00,000 --> 00:00:03,000\nsome text\n"
    )
    out = tmp_path / "out.jsonl.gz"
    n = jsonl_mod.text_to_jsonl(str(d), str(out))
    assert n == 2
    with gzip.open(out, "rt") as f:
        rows = [json.loads(l) for l in f]
    assert {r["id"] for r in rows} == {"vid1", "vid2"}
    assert rows[0]["length"] > 0
