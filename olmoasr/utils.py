"""Compat re-exports for the reference's ``olmoasr.utils`` surface
(/root/reference/olmoasr/utils.py)."""

from olmoasr_tpu.data.transcripts import TranscriptReader, write_vtt_segment
from olmoasr_tpu.data.segment import token_budget as over_ctx_len  # semantics map
from olmoasr_tpu.eval.wer import calculate_wer
from olmoasr_tpu.utils import (
    convert_to_milliseconds,
    convert_to_timestamp,
    format_timestamp,
)

__all__ = [
    "TranscriptReader",
    "calculate_wer",
    "convert_to_milliseconds",
    "convert_to_timestamp",
    "format_timestamp",
    "over_ctx_len",
    "write_vtt_segment",
]
