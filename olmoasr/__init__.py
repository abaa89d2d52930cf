"""Drop-in compatibility shim: ``import olmoasr`` works like the reference.

Users of allenai/OLMoASR (``/root/reference/olmoasr/__init__.py``) call
``olmoasr.load_model(name, device=..., inference=...)`` and use
``olmoasr.utils`` / ``olmoasr.preprocess`` helpers. This package maps those
entry points onto the TPU-native implementation.
"""

from olmoasr_tpu import MODEL2LINK, available_models
from olmoasr_tpu.api import OLMoASR, load_model
from olmoasr_tpu.models.dims import VARIANT_TO_DIMS, ModelDimensions
from olmoasr_tpu.transcribe import transcribe

__all__ = [
    "MODEL2LINK",
    "ModelDimensions",
    "OLMoASR",
    "VARIANT_TO_DIMS",
    "available_models",
    "load_model",
    "transcribe",
]
