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


def test_hub5_remix_channel_native(tmp_path):
    """Native NIST-SPHERE channel extraction (no sox): 2-channel PCM ->
    per-channel mono wavs with the right samples."""
    import numpy as np
    from scipy.io import wavfile

    from olmoasr_tpu.eval.datasets import remix_channel

    rate = 8000
    a = (np.sin(np.arange(rate) * 0.1) * 10000).astype("<i2")
    b = (np.cos(np.arange(rate) * 0.05) * 8000).astype("<i2")
    inter = np.empty(2 * rate, "<i2")
    inter[0::2], inter[1::2] = a, b
    header = (
        b"NIST_1A\n   1024\n"
        b"channel_count -i 2\n"
        b"sample_rate -i 8000\n"
        b"sample_coding -s3 pcm\n"
        b"end_head\n"
    )
    sph = tmp_path / "en_4093.sph"
    with open(sph, "wb") as f:
        f.write(header.ljust(1024, b" "))
        f.write(inter.tobytes())

    import shutil as _sh
    import olmoasr_tpu.eval.datasets as ds_mod
    # force the native path even when sox exists
    orig_which = _sh.which
    _sh.which = lambda name: None if name == "sox" else orig_which(name)
    try:
        out_a = str(tmp_path / "en_4093_A.wav")
        out_b = str(tmp_path / "en_4093_B.wav")
        assert remix_channel(str(sph), out_a, "A")
        assert remix_channel(str(sph), out_b, "B")
    finally:
        _sh.which = orig_which
    ra, da = wavfile.read(out_a)
    rb, db = wavfile.read(out_b)
    assert ra == rate and np.array_equal(da, a)
    assert rb == rate and np.array_equal(db, b)


def test_hub5_loader_remixes_from_sphere(tmp_path):
    """Hub5Loader materializes <id>_<ch>.wav from the LDC sphere tree."""
    import numpy as np

    rate = 8000
    a = (np.ones(rate) * 1000).astype("<i2")
    b = (np.ones(rate) * -1000).astype("<i2")
    inter = np.empty(2 * rate, "<i2")
    inter[0::2], inter[1::2] = a, b
    sph_dir = tmp_path / "hub5e_00" / "english"
    sph_dir.mkdir(parents=True)
    header = (
        b"NIST_1A\n   1024\n"
        b"channel_count -i 2\nsample_rate -i 8000\nsample_coding -s3 pcm\nend_head\n"
    )
    with open(sph_dir / "en_4093.sph", "wb") as f:
        f.write(header.ljust(1024, b" "))
        f.write(inter.tobytes())
    stm = tmp_path / "hub5e00.english.000405.stm"
    stm.write_text(
        ";; header\n"
        "en_4093 A en_4093_A 0.20 0.90 <o,en,f> HELLO THERE\n"
        "sw_2001 B sw_2001_B 1.00 2.00 <o,sw,m> SWITCHBOARD LINE\n"
    )
    from olmoasr_tpu.eval.datasets import Hub5Loader

    items = Hub5Loader(str(tmp_path), subset="callhome").load()
    assert len(items) == 1
    it = items[0]
    assert it.text == "HELLO THERE"
    assert it.start == 0.2 and it.end == 0.9
    import os as _os

    assert _os.path.isfile(it.audio)


def test_chime6_segmentation_native(tmp_path):
    """segment_chime6 cuts per-utterance wavs + manifest without pydub."""
    import json as _json

    import numpy as np
    from scipy.io import wavfile

    from olmoasr_tpu.eval.get_eval_set import segment_chime6

    root = tmp_path / "chime6"
    (root / "audio").mkdir(parents=True)
    (root / "transcripts").mkdir()
    rate = 16000
    wav = (np.arange(rate * 10) % 32000 - 16000).astype(np.int16)
    wavfile.write(str(root / "audio" / "S01_P01.wav"), rate, wav)
    utts = [
        {"words": "hello [noise] world", "start_time": "0:00:01.0",
         "end_time": "0:00:03.5", "speaker": "P01"},
        {"words": "[noise]", "start_time": "0:00:04", "end_time": "0:00:05"},
        {"words": "second utterance", "start_time": "0:00:06",
         "end_time": "0:00:08"},
    ]
    (root / "transcripts" / "S01.json").write_text(_json.dumps(utts))

    manifest = segment_chime6(str(root))
    rows = [_json.loads(l) for l in open(manifest)]
    assert len(rows) == 2  # the pure-[noise] utterance is dropped
    assert rows[0]["text"] == "hello world"
    r0, seg0 = wavfile.read(str(root / rows[0]["audio"]))
    assert r0 == rate and len(seg0) == int(2.5 * rate)


def test_hf_dataset_loader_monkeypatched(monkeypatch, tmp_path):
    """HFDatasetLoader maps rows -> EvalItems (datasets stubbed out)."""
    import numpy as np

    import olmoasr_tpu.eval.datasets as ds_mod

    class FakeDS:
        def __init__(self, rows):
            self.rows = rows
            self.column_names = ["audio", "transcription"]

        def cast_column(self, name, typ):
            return self

        def remove_columns(self, cols):
            return self

        def __len__(self):
            return len(self.rows)

        def __getitem__(self, i):
            return self.rows[i]

    rows = [
        {"audio": {"array": np.zeros(16000), "sampling_rate": 16000},
         "transcription": "hello world"},
        {"audio": {"array": np.ones(8000), "sampling_rate": 16000},
         "transcription": ""},
    ]

    import types, sys
    fake_mod = types.SimpleNamespace(
        load_dataset=lambda **kw: FakeDS(rows), Audio=lambda **kw: None
    )
    monkeypatch.setitem(sys.modules, "datasets", fake_mod)

    loader = ds_mod.HFDatasetLoader(str(tmp_path), "fleurs")
    items = loader.load()
    assert len(items) == 1  # empty-text row dropped
    assert items[0].text == "hello world"
    # audio decodes lazily (whole splits of hour-long files must not
    # materialize up front)
    wav = items[0].audio.load()
    assert isinstance(wav, np.ndarray) and len(wav) == 16000


def test_figures_table_and_chart(tmp_path):
    import json as _json

    from olmoasr_tpu.eval import figures

    for i, (name, wer) in enumerate(
        [("librispeech_clean", 0.031), ("tedlium", 0.044)]
    ):
        with open(tmp_path / f"r{i}.json", "w") as f:
            _json.dump({"eval_set": name, "wer": wer, "n_samples": 100}, f)
    rows = figures.load_results([str(tmp_path / "*.json")])
    table = figures.wer_table(rows, "small.en")
    assert "librispeech_clean" in table and "3.10" in table
    out = figures.wer_bar_chart(rows, str(tmp_path / "fig.png"), "small.en")
    import os as _os

    assert out and _os.path.getsize(out) > 1000
