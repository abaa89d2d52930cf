"""Output writer tests: vtt/srt/tsv/json formatting."""

import json
import os

from olmoasr_tpu.writers import get_writer

RESULT = {
    "text": " hello world. second segment.",
    "segments": [
        {"id": 0, "seek": 0, "start": 0.0, "end": 2.5,
         "text": " hello world.", "tokens": [1, 2], "temperature": 0.0,
         "avg_logprob": -0.1, "compression_ratio": 1.0, "no_speech_prob": 0.01},
        {"id": 1, "seek": 0, "start": 2.5, "end": 61.0,
         "text": " second segment.", "tokens": [3], "temperature": 0.0,
         "avg_logprob": -0.2, "compression_ratio": 1.0, "no_speech_prob": 0.02},
    ],
    "language": "en",
}


def test_vtt(tmp_path):
    get_writer("vtt", str(tmp_path))(RESULT, "audio.wav")
    content = (tmp_path / "audio.vtt").read_text()
    assert content.startswith("WEBVTT")
    assert "00:00.000 --> 00:02.500" in content
    assert "01:01.000" in content  # >60s formatting
    assert "hello world." in content


def test_srt(tmp_path):
    get_writer("srt", str(tmp_path))(RESULT, "audio.wav")
    content = (tmp_path / "audio.srt").read_text()
    assert content.startswith("1\n")
    assert "00:00:00,000 --> 00:00:02,500" in content  # comma decimal, hours
    assert "2\n" in content


def test_tsv_and_json_and_txt(tmp_path):
    get_writer("all", str(tmp_path))(RESULT, "audio.wav")
    tsv = (tmp_path / "audio.tsv").read_text().splitlines()
    assert tsv[0] == "start\tend\ttext"
    assert tsv[1].startswith("0\t2500\t")
    data = json.loads((tmp_path / "audio.json").read_text())
    assert data["language"] == "en"
    txt = (tmp_path / "audio.txt").read_text()
    assert "hello world." in txt
    assert {p.suffix for p in tmp_path.iterdir()} == {".txt", ".vtt", ".srt", ".tsv", ".json"}
