"""Load `/root/reference` modules for differential testing.

The reference (`/root/reference`) is pure Python + torch, so its data/token
logic can run right here and pin our rebuild byte-for-byte — no egress needed.
Its pip deps that are absent in this image (whisper, jiwer, fire, wandb,
zstandard, webvtt) are stubbed below with API-compatible shims; where behavior
matters for a differential (tokenizer, normalizer, VTT parsing, WER), the stub
routes through OUR implementation so both sides share it and the differential
isolates the logic under test (segmentation, token building, tagging,
filtering, model math).

NOTE: the repo also ships an `olmoasr` compat shim package; the reference's
package has the same name. `load_reference()` swaps sys.modules/sys.path
around the import and restores them, exposing the reference modules under a
namespace object instead.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types
from typing import Any, Dict

REF_ROOT = "/root/reference"

_cache: Dict[str, Any] = {}


class _Caption:
    __slots__ = ("start", "end", "text")

    def __init__(self, start: str, end: str, text: str):
        self.start, self.end, self.text = start, end, text


def _install_stubs() -> None:
    from olmoasr_tpu import normalizers as _norm_pkg
    from olmoasr_tpu import tokenizer as our_tok
    from olmoasr_tpu.data import transcripts as our_tr
    from olmoasr_tpu.eval import wer as our_wer
    from olmoasr_tpu.normalizers import EnglishTextNormalizer

    # ---- webvtt: parse with our native reader, expose caption objects ----
    webvtt = types.ModuleType("webvtt")

    def _parse(content: str):
        tr, _, _ = our_tr.TranscriptReader(
            transcript_string=content, ext="vtt"
        ).read()
        return [_Caption(s, e, t) for (s, e), t in tr.items()]

    webvtt.from_string = _parse
    webvtt.read = lambda path: _parse(open(path, encoding="utf-8").read())

    # ---- jiwer ----
    jiwer = types.ModuleType("jiwer")
    jiwer.wer = our_wer.wer

    def _measures(truth, hypothesis, **kw):
        m = our_wer.compute_measures(truth, hypothesis)
        return {
            "wer": m.wer,
            "substitutions": m.substitutions,
            "insertions": m.insertions,
            "deletions": m.deletions,
            "hits": m.hits,
        }

    jiwer.compute_measures = _measures

    # ---- fire / wandb / zstandard: import-time no-ops ----
    fire = types.ModuleType("fire")
    fire.Fire = lambda *a, **k: None
    wandb = types.ModuleType("wandb")
    for name in ("init", "log", "finish", "login"):
        setattr(wandb, name, lambda *a, **k: None)

    class _WandbClass:  # annotation-safe placeholders (wandb.Artifact etc.)
        def __init__(self, *a, **k):
            pass

    wandb.Table = _WandbClass
    wandb.Artifact = _WandbClass
    wandb.Settings = _WandbClass
    zstd = types.ModuleType("zstandard")
    zstd.ZstdDecompressor = object
    zstd.ZstdCompressor = object

    # ---- whisper: tokenizer/normalizers route through ours ----
    whisper = types.ModuleType("whisper")
    whisper.__path__ = []  # mark as package
    w_tok = types.ModuleType("whisper.tokenizer")
    w_tok.get_tokenizer = our_tok.get_tokenizer
    w_tok.Tokenizer = our_tok.Tokenizer
    w_tok.LANGUAGES = our_tok.LANGUAGES
    w_tok.TO_LANGUAGE_CODE = our_tok.TO_LANGUAGE_CODE
    w_norm = types.ModuleType("whisper.normalizers")
    w_norm.EnglishTextNormalizer = EnglishTextNormalizer
    w_norm.BasicTextNormalizer = getattr(
        _norm_pkg, "BasicTextNormalizer", EnglishTextNormalizer
    )

    w_audio = types.ModuleType("whisper.audio")
    w_audio.SAMPLE_RATE = 16000
    w_audio.N_FRAMES = 3000
    w_audio.HOP_LENGTH = 160
    w_audio.N_SAMPLES = 480000
    w_audio.CHUNK_LENGTH = 30
    w_audio.N_FFT = 400
    w_audio.N_MELS = 80
    w_audio.FRAMES_PER_SECOND = 100
    w_audio.TOKENS_PER_SECOND = 50
    w_audio.N_SAMPLES_PER_TOKEN = 320

    def _pad_or_trim(array, length: int = 480000, *, axis: int = -1):
        # faithful re-statement of pip-whisper's pad_or_trim for np/torch
        import numpy as np

        try:
            import torch

            if torch.is_tensor(array):
                if array.shape[axis] > length:
                    array = array.index_select(
                        dim=axis,
                        index=torch.arange(length, device=array.device),
                    )
                if array.shape[axis] < length:
                    pad_widths = [(0, 0)] * array.ndim
                    pad_widths[axis] = (0, length - array.shape[axis])
                    array = torch.nn.functional.pad(
                        array,
                        [p for sizes in pad_widths[::-1] for p in sizes],
                    )
                return array
        except ImportError:
            pass
        if array.shape[axis] > length:
            array = array.take(indices=range(length), axis=axis)
        if array.shape[axis] < length:
            pad_widths = [(0, 0)] * array.ndim
            pad_widths[axis] = (0, length - array.shape[axis])
            array = np.pad(array, pad_widths)
        return array

    w_audio.pad_or_trim = _pad_or_trim

    def _log_mel_spectrogram(*a, **k):  # only needed for audio-path tests
        raise NotImplementedError(
            "stub: differential tests do not exercise whisper.audio mel"
        )

    w_audio.log_mel_spectrogram = _log_mel_spectrogram
    w_audio.load_audio = _log_mel_spectrogram

    w_dec = types.ModuleType("whisper.decoding")

    class DecodingOptions:  # attribute bag, never executed in differentials
        def __init__(self, **kw):
            self.__dict__.update(kw)

    class DecodingResult:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    w_dec.DecodingOptions = DecodingOptions
    w_dec.DecodingResult = DecodingResult
    w_dec.decode = lambda *a, **k: None
    w_dec.detect_language = lambda *a, **k: None

    w_tim = types.ModuleType("whisper.timing")
    w_tim.add_word_timestamps = lambda *a, **k: None

    w_utils = types.ModuleType("whisper.utils")

    def _format_timestamp(
        seconds: float, always_include_hours: bool = False, decimal_marker: str = "."
    ):
        assert seconds >= 0
        milliseconds = round(seconds * 1000.0)
        hours = milliseconds // 3_600_000
        milliseconds -= hours * 3_600_000
        minutes = milliseconds // 60_000
        milliseconds -= minutes * 60_000
        s = milliseconds // 1_000
        milliseconds -= s * 1_000
        hours_marker = f"{hours:02d}:" if always_include_hours or hours > 0 else ""
        return f"{hours_marker}{minutes:02d}:{s:02d}{decimal_marker}{milliseconds:03d}"

    w_utils.format_timestamp = _format_timestamp
    w_utils.exact_div = lambda x, y: x // y
    w_utils.make_safe = lambda s: s
    w_utils.optional_int = lambda s: None if s in (None, "None") else int(s)
    w_utils.optional_float = lambda s: None if s in (None, "None") else float(s)
    w_utils.str2bool = lambda s: str(s).lower() in ("true", "1", "yes")
    w_utils.compression_ratio = lambda text: 1.0
    w_utils.get_writer = lambda *a, **k: (lambda *aa, **kk: None)

    whisper.tokenizer = w_tok
    whisper.normalizers = w_norm
    whisper.audio = w_audio
    whisper.decoding = w_dec
    whisper.timing = w_tim
    whisper.utils = w_utils
    whisper.DecodingOptions = DecodingOptions
    whisper.DecodingResult = DecodingResult

    # audio/media libs only touched by runtime paths the differentials never
    # call — import-time placeholders that fail loudly if actually used
    class _UnusableAttr:
        def __init__(self, name):
            self._name = name

        def __call__(self, *a, **k):
            raise NotImplementedError(f"stub {self._name} used by a test")

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _UnusableAttr(f"{self._name}.{name}")

    class _Unusable(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):  # introspection (inspect, repr, pickling)
                raise AttributeError(name)
            # `from stub import Name` at import time must succeed; using the
            # value raises
            return _UnusableAttr(f"{self.__name__}.{name}")

    mods = {
        "webvtt": webvtt,
        "jiwer": jiwer,
        "fire": fire,
        "wandb": wandb,
        "zstandard": zstd,
        "librosa": _Unusable("librosa"),
        "soundfile": _Unusable("soundfile"),
        "pydub": _Unusable("pydub"),
        "torchaudio": _Unusable("torchaudio"),
        "torchaudio.datasets": _Unusable("torchaudio.datasets"),
        "moviepy": _Unusable("moviepy"),
        "moviepy.editor": _Unusable("moviepy.editor"),
        "speechbrain": _Unusable("speechbrain"),
        "pycld2": _Unusable("pycld2"),
        "editdistance": _Unusable("editdistance"),
        "whisper": whisper,
        "whisper.tokenizer": w_tok,
        "whisper.normalizers": w_norm,
        "whisper.audio": w_audio,
        "whisper.decoding": w_dec,
        "whisper.timing": w_tim,
        "whisper.utils": w_utils,
    }
    for name, mod in mods.items():
        sys.modules.setdefault(name, mod)


def load_reference() -> types.SimpleNamespace:
    """Import the reference package + key scripts; return them namespaced.

    Safe to call repeatedly (cached). Our `olmoasr` shim package is swapped
    out of sys.modules during the import and restored afterwards.
    """
    if _cache:
        return _cache["ns"]

    _install_stubs()

    saved = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k == "olmoasr" or k.startswith("olmoasr.")
    }
    sys.path.insert(0, REF_ROOT)
    # train_timestamps.py does flat sibling imports (`from for_logging import`)
    sys.path.insert(1, f"{REF_ROOT}/scripts/training")
    try:
        ref_olmoasr = importlib.import_module("olmoasr")
        ref_utils = importlib.import_module("olmoasr.utils")
        ref_pre = importlib.import_module("olmoasr.preprocess")
        ref_model = importlib.import_module("olmoasr.model")
        ref_inf_model = importlib.import_module("olmoasr.inf_model")
        ref_transcribe = importlib.import_module("olmoasr.transcribe")

        def _from_file(name: str, path: str):
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        ref_train = _from_file(
            "ref_train_timestamps",
            f"{REF_ROOT}/scripts/training/train_timestamps.py",
        )
        ref_tagger = _from_file(
            "ref_data_tagger",
            f"{REF_ROOT}/scripts/data/filtering/data_tagger.py",
        )
        ref_filter = _from_file(
            "ref_process_tagged",
            f"{REF_ROOT}/scripts/data/filtering/process_tagged_data.py",
        )
    finally:
        for k in list(sys.modules):
            if k == "olmoasr" or k.startswith("olmoasr."):
                del sys.modules[k]
        sys.modules.update(saved)
        for p in (REF_ROOT, f"{REF_ROOT}/scripts/training"):
            if p in sys.path:
                sys.path.remove(p)

    ns = types.SimpleNamespace(
        olmoasr=ref_olmoasr,
        utils=ref_utils,
        preprocess=ref_pre,
        model=ref_model,
        inf_model=ref_inf_model,
        transcribe=ref_transcribe,
        train=ref_train,
        tagger=ref_tagger,
        filter=ref_filter,
    )
    _cache["ns"] = ns
    return ns
