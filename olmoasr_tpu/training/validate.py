"""In-loop validation: teacher-forced loss + argmax-decode WER on held-out sets.

Rebuild of the FSDP trainer's validation
(``/root/reference/scripts/training/train_fsdp_timestamps.py:1925-2309``:
``ValidationDataset`` + ``validate`` over HF tedlium/voxpopuli/common_voice/
ami-sdm) and the DDP trainer's in-loop train-WER
(``train_timestamps.py:1077-1196``): run the training forward on validation
batches, report loss and the WER of greedy argmax predictions against the
teacher-forced targets.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from olmoasr_tpu.eval.wer import compute_measures
from olmoasr_tpu.models import whisper as model_mod
from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.models.whisper import PADDING_TOKEN
from olmoasr_tpu.normalizers import EnglishTextNormalizer
from olmoasr_tpu.tokenizer import get_tokenizer
from olmoasr_tpu.training.train import loss_fn


def argmax_wer(
    logits: np.ndarray,  # (B, T, V) logits, or (B, T) precomputed argmax ids
    targets: np.ndarray,  # (B, T) with PADDING_TOKEN beyond the sequence
    tokenizer=None,
    normalizer=None,
) -> Tuple[float, List[Dict[str, str]]]:
    """Teacher-forced argmax WER (train_timestamps.py:1077-1196): decode the
    argmax prediction and the target, normalize, corpus WER. Pass the (B, T)
    argmax directly when it was computed on device — fetching the full
    (B, T, V) f32 logits costs ~743MB/batch at micro_bs=8."""
    tokenizer = tokenizer or get_tokenizer(False)
    normalizer = normalizer or EnglishTextNormalizer()
    preds = logits if logits.ndim == 2 else logits.argmax(-1)
    refs, hyps, rows = [], [], []
    for b in range(targets.shape[0]):
        valid = targets[b] != PADDING_TOKEN
        tgt_ids = targets[b][valid].tolist()
        pred_ids = preds[b][valid].tolist()
        ref = normalizer(tokenizer.decode(tgt_ids))
        hyp = normalizer(tokenizer.decode(pred_ids))
        if not ref.strip():
            continue
        refs.append(ref)
        hyps.append(hyp)
        rows.append({"pred": hyp, "target": ref})
    if not refs:
        return 0.0, rows
    return compute_measures(refs, hyps).wer, rows


def validate(
    params,
    dims: ModelDimensions,
    batches: Iterable[Dict[str, np.ndarray]],
    *,
    compute_dtype=jnp.bfloat16,
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Validation loop: mean teacher-forced loss + argmax WER over batches
    shaped like training microbatches {mel, text_input, text_target[, padding_mask]}."""
    losses: List[float] = []
    all_refs: List[str] = []
    all_hyps: List[str] = []
    tokenizer = get_tokenizer(False)
    normalizer = EnglishTextNormalizer()

    @jax.jit
    def fwd(params, mel, ti, tt, pm):
        # ONE forward: loss_fn already computes the argmax internally
        # (aux["pred"] via the in-loop accuracy path); a second
        # forward_train for logits doubled the validation step, and
        # fetching the (B, T, V) f32 logits to host cost ~743MB/batch —
        # only the (B, T) int32 argmax crosses the wire now.
        loss, aux = loss_fn(
            params, dims, mel, ti, tt, pm,
            compute_dtype=compute_dtype, remat=False, return_pred=True,
        )
        return loss, aux["pred"]

    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        loss, preds = fwd(
            params,
            jnp.asarray(batch["mel"]),
            jnp.asarray(batch["text_input"]),
            jnp.asarray(batch["text_target"]),
            jnp.asarray(batch["padding_mask"]) if "padding_mask" in batch else None,
        )
        losses.append(float(loss))
        wer_val, rows = argmax_wer(
            np.asarray(preds), np.asarray(batch["text_target"]),
            tokenizer, normalizer,
        )
        for r in rows:
            all_refs.append(r["target"])
            all_hyps.append(r["pred"])

    corpus = compute_measures(all_refs, all_hyps) if all_refs else None
    return {
        "val/loss": float(np.mean(losses)) if losses else float("nan"),
        "val/wer": corpus.wer if corpus else float("nan"),
        "val/n_batches": float(len(losses)),
    }
