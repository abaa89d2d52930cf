"""Gradio demo: side-by-side OLMoASR-TPU transcription.

Rebuild of ``/root/reference/demo/demo.py`` and ``demo/live_demo.py``:

  * File tab — transcribe with timestamps, greedy or beam.
  * Compare tab — OLMoASR next to an HF ``pipeline`` baseline
    (demo.py:150-240's side-by-side comparison), gated on transformers.
  * Live tab — streaming mic, rolling-buffer retranscription.
  * Checkpoint flow — ``ensure_checkpoint``/``export_hf`` mirror the
    reference's hf_hub_download + convert_openai_to_hf startup
    (demo.py:33-110), using our native converter.

Gated on gradio availability (not in the base image).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

#: the reference demo's checkpoint source (demo.py:26-30)
OLMOASR_REPO = "olmoasr/OLMoASR-small.en"
CHECKPOINT_FILENAME = (
    "latesttrain_00524288_small_ddp-train_grad-acc_fp16_non_ddp_inf.pt"
)


def ensure_checkpoint(
    local_dir: str = "checkpoints",
    repo_id: str = OLMOASR_REPO,
    filename: str = CHECKPOINT_FILENAME,
) -> Optional[str]:
    """Download the released checkpoint from the HF hub (reference
    demo.py:40-63); returns the local path, or None when offline."""
    path = os.path.join(local_dir, filename)
    if os.path.exists(path):
        return path
    try:
        from huggingface_hub import hf_hub_download  # gated

        os.makedirs(local_dir, exist_ok=True)
        return hf_hub_download(
            repo_id=repo_id, filename=filename, local_dir=local_dir
        )
    except Exception as e:  # offline / missing hub
        print(f"checkpoint download unavailable: {e}")
        return None


def export_hf(ckpt_path: str, out_dir: str) -> Optional[str]:
    """Convert a ``.pt`` checkpoint to a HF WhisperForConditionalGeneration
    directory (reference demo.py:66-110 runs convert_openai_to_hf.py; we use
    the native converter in integrations/hf.py)."""
    if os.path.exists(os.path.join(out_dir, "config.json")):
        return out_dir
    try:
        from olmoasr_tpu.integrations.hf import convert_checkpoint_to_hf

        return convert_checkpoint_to_hf(ckpt_path, out_dir)
    except Exception as e:
        print(f"HF export unavailable: {e}")
        return None


def _hf_pipeline(hf_model: str):
    """HF ASR pipeline for the comparison tab (reference demo.py:112-148)."""
    try:
        from transformers import pipeline  # gated on weights availability

        return pipeline(
            "automatic-speech-recognition", model=hf_model, framework="pt"
        )
    except Exception as e:
        print(f"HF pipeline unavailable: {e}")
        return None


def build_demo(
    model_name: str = "tiny.en",
    download_root: Optional[str] = None,
    hf_baseline: str = "openai/whisper-tiny.en",
):
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

    hf_pipe = None

    def compare(audio_path: str):
        """OLMoASR vs HF-pipeline side-by-side (reference demo.py:150-240)."""
        nonlocal hf_pipe
        ours = model.transcribe(audio_path)["text"].strip()
        if hf_pipe is None:
            hf_pipe = _hf_pipeline(hf_baseline)
        if hf_pipe is None:
            return ours, "(HF baseline unavailable offline)"
        theirs = hf_pipe(audio_path, return_timestamps=True)["text"].strip()
        return ours, theirs

    with gr.Blocks(title="OLMoASR-TPU") as demo:
        gr.Markdown(f"# OLMoASR-TPU demo — {model_name}")
        with gr.Tab("File"):
            audio_in = gr.Audio(type="filepath", label="Audio file")
            beam = gr.Checkbox(label="Beam search (beam=5, best_of=5)")
            out = gr.Textbox(label="Transcript", lines=12)
            gr.Button("Transcribe").click(
                transcribe_file, [audio_in, beam], out
            )
        with gr.Tab("Compare"):
            cmp_in = gr.Audio(type="filepath", label="Audio file")
            with gr.Row():
                ours_out = gr.Textbox(label=f"OLMoASR-TPU ({model_name})", lines=10)
                hf_out = gr.Textbox(label=f"HF pipeline ({hf_baseline})", lines=10)
            gr.Button("Compare").click(compare, [cmp_in], [ours_out, hf_out])
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
