"""Eval harness tests on a synthetic LibriSpeech-format tree + manifest sets,
driving the real short_form_eval loop with a micro model."""

import json
import os

import numpy as np
import pytest

import jax

from olmoasr_tpu.api import OLMoASR
from olmoasr_tpu.eval.datasets import (
    DatasetFactory,
    LibriSpeechLoader,
    ManifestLoader,
    TedliumLoader,
    clean_coraal_text,
)
from olmoasr_tpu.eval.harness import bootstrap_ci, short_form_eval, write_results
from olmoasr_tpu.models.dims import ModelDimensions

MICRO = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4, n_audio_layer=1,
    n_vocab=51864, n_text_ctx=448, n_text_state=64, n_text_head=4, n_text_layer=1,
)


@pytest.fixture(scope="module")
def librispeech_tree(tmp_path_factory):
    import scipy.io.wavfile as wavfile

    root = tmp_path_factory.mktemp("ls") / "LibriSpeech" / "test-clean"
    chap = root / "19" / "198"
    chap.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        utt = f"19-198-{i:04d}"
        wav = (rng.standard_normal(16000) * 1000).astype(np.int16)
        wavfile.write(str(chap / f"{utt}.wav"), 16000, wav)
        lines.append(f"{utt} HELLO WORLD NUMBER {i}")
    (chap / "19-198.trans.txt").write_text("\n".join(lines))
    return str(root.parent.parent)


def test_librispeech_loader(librispeech_tree):
    items = LibriSpeechLoader(librispeech_tree, "test-clean").load()
    assert len(items) == 3
    assert items[0].text == "HELLO WORLD NUMBER 0"
    assert items[0].audio.endswith("19-198-0000.wav")


def test_manifest_loader(tmp_path):
    import scipy.io.wavfile as wavfile

    wavfile.write(
        str(tmp_path / "a.wav"), 16000, np.zeros(8000, np.int16)
    )
    (tmp_path / "set.jsonl").write_text(
        json.dumps({"audio": "a.wav", "text": "some text", "id": "0"}) + "\n"
    )
    items = ManifestLoader(str(tmp_path), "set.jsonl").load()
    assert len(items) == 1
    assert os.path.isfile(items[0].audio)


def test_coraal_cleaner():
    assert clean_coraal_text("so [laugh] I went (pause 0.5) there") == "so I went there"
    assert clean_coraal_text("um you know uh") == "you know"


def test_factory_known_sets():
    for name in ("librispeech_clean", "tedlium", "coraal", "callhome", "wsj"):
        loader = DatasetFactory.create_loader(name, "/tmp/x")
        assert loader is not None


def test_short_form_eval_end_to_end(librispeech_tree, tmp_path):
    """Full loop with a micro random model: WER is garbage but the pipeline,
    normalizer, aggregation, and writers must all work."""
    model = OLMoASR(MICRO, inference=True)
    # patch sample_len small for speed via decode options override
    import olmoasr_tpu.eval.harness as H
    from olmoasr_tpu.decoding import DecodingOptions

    orig = H.DecodingOptions

    def small_opts(**kw):
        kw["sample_len"] = 8
        kw["fp16"] = False
        return orig(**kw)

    H.DecodingOptions = small_opts
    try:
        result = short_form_eval(
            model, "librispeech_clean", librispeech_tree, batch_size=2
        )
    finally:
        H.DecodingOptions = orig

    assert result.n_samples == 3
    assert 0 <= result.wer  # garbage hyps: wer >= 0 (likely 1.0)
    assert result.audio_seconds == pytest.approx(3.0, rel=0.01)
    write_results(result, str(tmp_path), "micro")
    assert os.path.isfile(tmp_path / "librispeech_clean_micro.txt")
    assert os.path.isfile(tmp_path / "librispeech_clean_micro_per_sample.csv")


def test_bootstrap_ci():
    lo, hi = bootstrap_ci([0.1, 0.2, 0.3, 0.15, 0.25] * 10)
    assert 0.1 < lo < hi < 0.3


def test_chime6_loader(tmp_path):
    import scipy.io.wavfile as wavfile

    from olmoasr_tpu.eval.datasets import CHiME6Loader

    tdir = tmp_path / "transcriptions" / "eval"
    adir = tmp_path / "audio" / "eval"
    tdir.mkdir(parents=True)
    adir.mkdir(parents=True)
    wavfile.write(str(adir / "S01_P01.wav"), 16000, np.zeros(16000 * 20, np.int16))
    (tdir / "S01.json").write_text(json.dumps([
        {"start_time": "0:00:01.00", "end_time": "0:00:03.50",
         "words": "hello there [noise]", "speaker": "P01"},
        {"start_time": "0:00:04.00", "end_time": "0:00:05.00",
         "words": "[laughs]", "speaker": "P02"},
    ]))
    items = CHiME6Loader(str(tmp_path)).load()
    assert len(items) == 1  # noise-only utterance dropped
    assert items[0].text == "hello there"
    assert items[0].start == 1.0 and items[0].end == 3.5
