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

# module-form imports, matching the reference package surface
# (reference __init__.py:10-20: model, inf_model, preprocess, utils)
from olmoasr import inf_model, model, preprocess, utils  # noqa: E402,F401

__all__ = [
    "MODEL2LINK",
    "ModelDimensions",
    "OLMoASR",
    "VARIANT_TO_DIMS",
    "available_models",
    "load_model",
    "transcribe",
]
