"""Shim for ``olmoasr.inf_model`` (reference inference-model module): the
TPU stack uses ONE functional model; the KV-cached inference surface maps to
``KVCache`` + ``decode_step``."""

from olmoasr_tpu.api import OLMoASR
from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.models.whisper import KVCache, decode_step, init_cache

__all__ = ["ModelDimensions", "OLMoASR", "KVCache", "decode_step", "init_cache"]
