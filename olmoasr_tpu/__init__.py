"""olmoasr_tpu: a TPU-native (JAX/XLA/Pallas) speech-recognition framework with
the capabilities of allenai/OLMoASR (an open Whisper reproduction).

Public API parity with ``/root/reference/olmoasr/__init__.py``:
``load_model(name_or_path, ...)`` returns a model object exposing
``transcribe`` / ``decode`` / ``detect_language``.
"""

from olmoasr_tpu.models.dims import ModelDimensions, VARIANT_TO_DIMS
from olmoasr_tpu.version import __version__

__all__ = [
    "ModelDimensions",
    "VARIANT_TO_DIMS",
    "load_model",
    "available_models",
    "__version__",
]

# Released OLMoASR checkpoints (olmoasr/__init__.py:23-30). Downloads require
# network; local paths are accepted everywhere a name is.
MODEL2LINK = {
    "tiny.en": "https://huggingface.co/allenai/OLMoASR/resolve/main/models/OLMoASR-tiny.en.pt",
    "base.en": "https://huggingface.co/allenai/OLMoASR/resolve/main/models/OLMoASR-base.en.pt",
    "small.en": "https://huggingface.co/allenai/OLMoASR/resolve/main/models/OLMoASR-small.en.pt",
    "medium.en": "https://huggingface.co/allenai/OLMoASR/resolve/main/models/OLMoASR-medium.en.pt",
    "large.en": "https://huggingface.co/allenai/OLMoASR/resolve/main/models/OLMoASR-large.en.pt",
    "large.en-v2": "https://huggingface.co/allenai/OLMoASR/resolve/main/models/OLMoASR-large.en-v2.pt",
}


def available_models():
    return list(MODEL2LINK)


def load_model(*args, **kwargs):
    from olmoasr_tpu.api import load_model as _load_model

    return _load_model(*args, **kwargs)
