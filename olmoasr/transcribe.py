"""Shim for ``olmoasr.transcribe`` (module import form used by the
reference's ``from olmoasr import transcribe``)."""

from olmoasr_tpu.transcribe import cli, transcribe, transcribe_many

__all__ = ["cli", "transcribe", "transcribe_many"]
