"""Gradio demo: side-by-side OLMoASR-TPU transcription.

Rebuild of ``/root/reference/demo/demo.py`` and ``demo/live_demo.py``: a file
transcription demo plus a simple streaming mic demo, both behind the same
``load_model`` API. Gated on gradio availability (not in the base image).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def build_demo(model_name: str = "tiny.en", download_root: Optional[str] = None):
    import gradio as gr  # gated

    from olmoasr_tpu import load_model
    from olmoasr_tpu.audio import SAMPLE_RATE, resample_poly

    model = load_model(model_name, download_root=download_root, inference=True)

    def transcribe_file(audio_path: str, beam: bool) -> str:
        kwargs = {"beam_size": 5, "best_of": 5} if beam else {}
        result = model.transcribe(audio_path, **kwargs)
        lines = [
            f"[{s['start']:7.2f} -> {s['end']:7.2f}] {s['text']}"
            for s in result["segments"]
        ]
        return result["text"].strip() + "\n\n" + "\n".join(lines)

    def transcribe_mic(state, new_chunk):
        """Streaming mic transcription (live_demo.py:31 semantics): accumulate
        audio, retranscribe the rolling buffer."""
        sr, chunk = new_chunk
        chunk = chunk.astype(np.float32) / 32768.0
        if chunk.ndim == 2:
            chunk = chunk.mean(axis=1)
        if sr != SAMPLE_RATE:
            chunk = resample_poly(chunk, SAMPLE_RATE, sr)
        stream = chunk if state is None else np.concatenate([state, chunk])
        text = model.transcribe(stream)["text"]
        return stream, text

    with gr.Blocks(title="OLMoASR-TPU") as demo:
        gr.Markdown(f"# OLMoASR-TPU demo — {model_name}")
        with gr.Tab("File"):
            audio_in = gr.Audio(type="filepath", label="Audio file")
            beam = gr.Checkbox(label="Beam search (beam=5, best_of=5)")
            out = gr.Textbox(label="Transcript", lines=12)
            gr.Button("Transcribe").click(
                transcribe_file, [audio_in, beam], out
            )
        with gr.Tab("Live"):
            state = gr.State()
            mic = gr.Audio(sources=["microphone"], streaming=True)
            live_out = gr.Textbox(label="Live transcript")
            mic.stream(transcribe_mic, [state, mic], [state, live_out])
    return demo


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny.en")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()
    build_demo(args.model).launch(server_port=args.port)


if __name__ == "__main__":
    main()
