"""Compat re-exports for the reference's ``olmoasr.preprocess`` surface
(/root/reference/olmoasr/preprocess.py)."""

from olmoasr_tpu.data.align import align_machine_transcript, merge_man_mach_segs
from olmoasr_tpu.data.segment import (
    SEGMENT_COUNT_THRESHOLD,
    Segment,
    SegmentCounter,
    chunk_data,
    preprocess_jsonl,
    preprocess_jsonls,
)

__all__ = [
    "SEGMENT_COUNT_THRESHOLD",
    "Segment",
    "SegmentCounter",
    "align_machine_transcript",
    "chunk_data",
    "merge_man_mach_segs",
    "preprocess_jsonl",
    "preprocess_jsonls",
]
