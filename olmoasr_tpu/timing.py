"""Word-level timestamps: cross-attention alignment via dynamic time warping.

Rebuild of ``[pip:whisper] timing`` (used at
``/root/reference/olmoasr/transcribe.py:22,411-420``). The reference optionally
uses a Triton CUDA kernel for the DTW inner loop; the O(T*F) DTW recurrence is
sequential and tiny (≤448 × 1500), so on the TPU stack we run it host-side in
NumPy — the expensive part (the decoder forward capturing cross-attention
weights) runs on device via ``models.whisper.cross_attention_weights``.

OLMoASR checkpoints ship no alignment-heads metadata
(``/root/reference/olmoasr/__init__.py:145,163`` stubs ``alignment_heads=None``),
so like whisper's default we use all heads of the upper half of decoder layers.

Attribution: ``merge_punctuations`` is a near-verbatim port and
``find_alignment``'s token/word bookkeeping is closely adapted from
openai-whisper (``whisper/timing.py``), Copyright (c) 2022 OpenAI, MIT
License — see the repository-root ``NOTICES`` file. The punctuation-merge
rules and word-boundary semantics define where published word timestamps
land; diverging from them would be a parity bug.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import TYPE_CHECKING, List

import numpy as np

import jax.numpy as jnp

from olmoasr_tpu.audio import HOP_LENGTH, SAMPLE_RATE, TOKENS_PER_SECOND
from olmoasr_tpu.models import whisper as model_mod
from olmoasr_tpu.tokenizer import Tokenizer

if TYPE_CHECKING:
    from olmoasr_tpu.api import OLMoASR


def median_filter(x: np.ndarray, filter_width: int) -> np.ndarray:
    """Median filter over the last axis with reflect padding."""
    if filter_width <= 1 or x.shape[-1] <= filter_width:
        return x
    assert filter_width % 2 == 1
    pad = filter_width // 2
    padded = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(padded, filter_width, axis=-1)
    return np.median(windows, axis=-1)


def dtw(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW over a cost matrix x (N, M); returns the alignment path
    (text_indices, time_indices)."""
    N, M = x.shape
    cost = np.full((N + 1, M + 1), np.inf, dtype=np.float64)
    trace = np.full((N + 1, M + 1), -1, dtype=np.int8)
    cost[0, 0] = 0.0
    for i in range(1, N + 1):
        prev_row = cost[i - 1]
        cur_row = cost[i]
        xi = x[i - 1]
        for j in range(1, M + 1):
            c0 = prev_row[j - 1]
            c1 = prev_row[j]
            c2 = cur_row[j - 1]
            if c0 <= c1 and c0 <= c2:
                c, t = c0, 0
            elif c1 <= c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cur_row[j] = xi[j - 1] + c
            trace[i, j] = t

    # backtrace
    i, j = N, M
    trace[0, :] = 2
    trace[:, 0] = 1
    text_indices, time_indices = [], []
    while i > 0 or j > 0:
        text_indices.append(i - 1)
        time_indices.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        elif t == 2:
            j -= 1
        else:
            raise ValueError("Unexpected trace[i, j]")
    return np.array(text_indices)[::-1], np.array(time_indices)[::-1]


@dataclass
class WordTiming:
    word: str
    tokens: List[int]
    start: float
    end: float
    probability: float


def find_alignment(
    model: "OLMoASR",
    tokenizer: Tokenizer,
    text_tokens: List[int],
    mel: jnp.ndarray,  # (n_mels, 3000)
    num_frames: int,
    *,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
) -> List[WordTiming]:
    if len(text_tokens) == 0:
        return []

    tokens = jnp.asarray(
        [
            list(tokenizer.sot_sequence)
            + [tokenizer.no_timestamps]
            + text_tokens
            + [tokenizer.eot]
        ],
        jnp.int32,
    )
    sample_begin = len(tokenizer.sot_sequence) + 1

    audio_features = model.embed_audio(mel[None])
    logits = model_mod.decode_train(model.params, model.dims, tokens, audio_features)
    logits = np.asarray(logits[0])  # (T, V)
    # columns [: eot] (EOT excluded from the softmax), matching
    # [pip:whisper] timing.find_alignment — including EOT deflates word
    # probabilities and perturbs the anomaly heuristics.
    sampled_logits = logits[sample_begin - 1 : -1, : tokenizer.eot]
    token_probs = _softmax(sampled_logits, axis=-1)
    text_token_probs = token_probs[np.arange(len(text_tokens)),
                                   np.array(text_tokens)]

    weights_all = model_mod.cross_attention_weights(
        model.params, model.dims, tokens, audio_features
    )  # (L, 1, H, T, 1500)
    L = weights_all.shape[0]
    # whisper default: all heads of the upper half of decoder layers
    w = np.asarray(weights_all[L // 2 :, 0])  # (L/2, H, T, 1500)
    w = w.reshape(-1, w.shape[-2], w.shape[-1])  # (heads, T, 1500)
    w = w[:, :, : num_frames // 2]

    # normalize and smooth like whisper.timing
    std = w.std(axis=-2, keepdims=True)
    mean = w.mean(axis=-2, keepdims=True)
    w = (w - mean) / (std + 1e-8)
    w = median_filter(w, medfilt_width)
    matrix = w.mean(axis=0)  # (T, frames/2)
    matrix = matrix[sample_begin - 1 : -1]

    text_indices, time_indices = dtw(-matrix)

    words, word_tokens = tokenizer.split_to_word_tokens(
        list(text_tokens) + [tokenizer.eot]
    )
    if len(word_tokens) <= 1:
        return []
    word_boundaries = np.pad(
        np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0)
    )

    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] / TOKENS_PER_SECOND
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[word_boundaries[1:]]
    word_probabilities = [
        float(np.mean(text_token_probs[i:j]))
        for i, j in zip(word_boundaries[:-1], word_boundaries[1:])
    ]

    return [
        WordTiming(word, tokens_, start, end, probability)
        for word, tokens_, start, end, probability in zip(
            words, word_tokens, start_times, end_times, word_probabilities
        )
    ]


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def merge_punctuations(alignment: List[WordTiming], prepended: str, appended: str):
    # merge prepended punctuations
    i = len(alignment) - 2
    j = len(alignment) - 1
    while i >= 0:
        previous = alignment[i]
        following = alignment[j]
        if previous.word.startswith(" ") and previous.word.strip() in prepended:
            following.word = previous.word + following.word
            following.tokens = previous.tokens + following.tokens
            previous.word = ""
            previous.tokens = []
        else:
            j = i
        i -= 1

    # merge appended punctuations
    i = 0
    j = 1
    while j < len(alignment):
        previous = alignment[i]
        following = alignment[j]
        if not previous.word.endswith(" ") and following.word in appended:
            previous.word = previous.word + following.word
            previous.tokens = previous.tokens + following.tokens
            following.word = ""
            following.tokens = []
        else:
            i = j
        j += 1


def add_word_timestamps(
    *,
    segments: List[dict],
    model: "OLMoASR",
    tokenizer: Tokenizer,
    mel: jnp.ndarray,
    num_frames: int,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    last_speech_timestamp: float,
    **kwargs,
):
    """Attach ``words`` lists to segments ([pip:whisper] timing.add_word_timestamps)."""
    if len(segments) == 0:
        return

    text_tokens_per_segment = [
        [token for token in segment["tokens"] if token < tokenizer.eot]
        for segment in segments
    ]
    text_tokens = list(itertools.chain.from_iterable(text_tokens_per_segment))
    alignment = find_alignment(model, tokenizer, text_tokens, mel, num_frames, **kwargs)
    word_durations = np.array([t.end - t.start for t in alignment])
    word_durations = word_durations[word_durations.nonzero()]
    median_duration = np.median(word_durations) if len(word_durations) > 0 else 0.0
    median_duration = min(0.7, float(median_duration))
    max_duration = median_duration * 2

    # truncate long words at sentence boundaries (hallucination heuristic)
    if len(word_durations) > 0:
        sentence_end_marks = ".。!！?？"
        for i in range(1, len(alignment)):
            if alignment[i].end - alignment[i].start > max_duration:
                if alignment[i].word in sentence_end_marks:
                    alignment[i].end = alignment[i].start + max_duration
                elif alignment[i - 1].word in sentence_end_marks:
                    alignment[i].start = alignment[i].end - max_duration

    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    time_offset = segments[0]["seek"] * HOP_LENGTH / SAMPLE_RATE
    word_index = 0

    for segment, text_tokens_ in zip(segments, text_tokens_per_segment):
        saved_tokens = 0
        words = []
        while word_index < len(alignment) and saved_tokens < len(text_tokens_):
            timing = alignment[word_index]
            if timing.word:
                words.append(
                    dict(
                        word=timing.word,
                        start=round(time_offset + timing.start, 2),
                        end=round(time_offset + timing.end, 2),
                        probability=timing.probability,
                    )
                )
            saved_tokens += len(timing.tokens)
            word_index += 1

        # hallucinated start fixups (whisper.timing semantics)
        if len(words) > 0:
            if (
                words[0]["end"] - last_speech_timestamp > median_duration * 4
                and (
                    words[0]["end"] - words[0]["start"] > max_duration
                    or (
                        len(words) > 1
                        and words[1]["end"] - words[0]["start"] > max_duration * 2
                    )
                )
            ):
                if (
                    len(words) > 1
                    and words[1]["end"] - words[1]["start"] > max_duration
                ):
                    boundary = max(words[1]["end"] / 2, words[1]["end"] - max_duration)
                    words[0]["end"] = words[1]["start"] = boundary
                words[0]["start"] = max(0, words[0]["end"] - max_duration)

            if segment["start"] < words[0]["end"] and segment["start"] - 0.5 > words[0]["start"]:
                words[0]["start"] = max(
                    0, min(words[0]["end"] - median_duration, segment["start"])
                )
            else:
                segment["start"] = words[0]["start"]

            if segment["end"] > words[-1]["start"] and segment["end"] + 0.5 < words[-1]["end"]:
                words[-1]["end"] = max(
                    words[-1]["start"] + median_duration, segment["end"]
                )
            else:
                segment["end"] = words[-1]["end"]

            last_speech_timestamp = segment["end"]

        segment["words"] = words
