"""Shim for ``olmoasr.model`` (reference training-model module): maps the
reference's ``ModelDimensions`` / ``OLMoASR`` onto the TPU-native stack."""

from olmoasr_tpu.api import OLMoASR
from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.models.whisper import (
    forward_train,
    init_params,
    layer_norm,
    sdpa,
    sinusoids,
)

__all__ = [
    "ModelDimensions", "OLMoASR", "forward_train", "init_params",
    "layer_norm", "sdpa", "sinusoids",
]
