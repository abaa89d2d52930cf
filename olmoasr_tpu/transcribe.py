"""Long-form transcription: sliding 30s windows with temperature fallback and
timestamp-token segmentation.

Faithful rebuild of ``/root/reference/olmoasr/transcribe.py:47-523``, including
its (intentionally) inert prompt-conditioning: the reference comments out the
code that feeds previous text as a prompt (transcribe.py:297-302), so
``condition_on_previous_text`` only gates ``prompt_reset_since`` bookkeeping
(transcribe.py:512-514). We reproduce that to match output fidelity.

The decode path underneath is the batched on-device loop in
``olmoasr_tpu.decoding``; this module is pure host orchestration.
"""

from __future__ import annotations

import functools
import sys
import threading
import warnings
from typing import TYPE_CHECKING, List, Optional, Tuple, Union

import numpy as np

import jax as _jax
import jax.numpy as jnp

from olmoasr_tpu.audio import (
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_chunk_unnorm,
    log_mel_spectrogram,
    pad_or_trim,
)
from olmoasr_tpu.decoding import DecodingOptions, DecodingResult
from olmoasr_tpu.tokenizer import LANGUAGES, get_tokenizer
from olmoasr_tpu.utils import exact_div, format_timestamp, make_safe

if TYPE_CHECKING:
    from olmoasr_tpu.api import OLMoASR

# OLMOASR_PERF_TIMERS=1: transcribe_many records its phase timings here
# (bench.py reads mel_stack_s to split the host->device PCM upload + mel
# prefix out of the wall time — the decode-bound RTFx accounting, VERDICT
# weak #7: the upload dominates through a tunneled chip but is negligible on
# PCIe-local hosts).
PERF_TIMERS: dict = {}


class _FileState:
    """Per-file long-form state machine: the sliding-window seek loop of
    reference ``transcribe.py:276-523`` split into ``current_window()`` (emit
    the next 30s mel window, or None when done) and ``consume(result)``
    (advance seek, cut timestamp segments, apply heuristics).

    The split is what enables batching ACROSS files (SURVEY §7.2): a driver
    collects one pending window from each active file, decodes them in one
    batched call, and feeds each result back.
    """

    def __init__(
        self,
        model: "OLMoASR",
        audio: Union[str, np.ndarray],
        tokenizer,
        *,
        verbose: Optional[bool],
        compression_ratio_threshold: Optional[float],
        logprob_threshold: Optional[float],
        no_speech_threshold: Optional[float],
        condition_on_previous_text: bool,
        initial_prompt: Optional[str],
        word_timestamps: bool,
        prepend_punctuations: str,
        append_punctuations: str,
        clip_timestamps: Union[str, List[float]],
        hallucination_silence_threshold: Optional[float],
        language: str,
        precomputed_mel: Optional[np.ndarray] = None,
        mel_frames: Optional[int] = None,
    ):
        self.model = model
        self.tokenizer = tokenizer
        self.verbose = verbose
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        self.no_speech_threshold = no_speech_threshold
        self.condition_on_previous_text = condition_on_previous_text
        self.word_timestamps = word_timestamps
        self.prepend_punctuations = prepend_punctuations
        self.append_punctuations = append_punctuations
        self.hallucination_silence_threshold = hallucination_silence_threshold
        self.language = language
        self.punctuation = "\"'“¿([{-\"'.。,，!！?？:：”)]}、"

        # Pad 30 seconds of silence to the input audio, for slicing.
        # ``precomputed_mel`` lets transcribe_many batch the log-mel of many
        # files into one device call (the per-file STFT was measured at
        # ~0.9s/2min-file — serial, it dominated batched long-form).
        if mel_frames is not None:
            # stack-backed (transcribe_many): the mel lives in the shared
            # device stack; windows arrive through the batched round gather,
            # so this state never slices a mel itself
            self.mel = None
            self.content_frames = mel_frames - N_FRAMES
        elif precomputed_mel is not None:
            # may be a DEVICE array (transcribe_many keeps the batched mel on
            # chip; pulling it to host + re-uploading windows costs ~20MB/file
            # of round-trips through the axon tunnel)
            self.mel = precomputed_mel
            self.content_frames = self.mel.shape[-1] - N_FRAMES
        else:
            mel = log_mel_spectrogram(audio, model.dims.n_mels, padding=N_SAMPLES)
            self.mel = np.asarray(mel)
            self.content_frames = self.mel.shape[-1] - N_FRAMES
        self.content_duration = float(
            self.content_frames * HOP_LENGTH / SAMPLE_RATE
        )

        if isinstance(clip_timestamps, str):
            clip_timestamps = [
                float(ts)
                for ts in (clip_timestamps.split(",") if clip_timestamps else [])
            ]
        seek_points = [round(ts * FRAMES_PER_SECOND) for ts in clip_timestamps]
        if len(seek_points) == 0:
            seek_points.append(0)
        if len(seek_points) % 2 == 1:
            seek_points.append(self.content_frames)
        self.seek_clips: List[Tuple[int, int]] = list(
            zip(seek_points[::2], seek_points[1::2])
        )

        self.clip_idx = 0
        self.seek = self.seek_clips[0][0]
        self.input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)
        self.time_precision = self.input_stride * HOP_LENGTH / SAMPLE_RATE
        self.all_tokens: List[int] = []
        self.all_segments: List[dict] = []
        self.prompt_reset_since = 0
        self.last_speech_timestamp = 0.0

        if initial_prompt is not None:
            self.initial_prompt_tokens = tokenizer.encode(
                " " + initial_prompt.strip()
            )
            self.all_tokens.extend(self.initial_prompt_tokens)
        else:
            self.initial_prompt_tokens = []

        # window-scoped scratch set by current_window()
        self._segment_size = 0
        self._mel_segment: Optional[np.ndarray] = None

    # -- window emission -----------------------------------------------------

    def advance_window(self) -> Optional[Tuple[int, int]]:
        """Advance clip bookkeeping; return (seek, segment_size) for the next
        30s window, or None when the file is exhausted. Does NOT slice the
        mel — transcribe_many gathers all active files' windows in ONE device
        call (per-file device slices cost a dispatch each through the remote
        tunnel, measured ~2s/round at batch 64)."""
        while self.clip_idx < len(self.seek_clips):
            seek_clip_start, seek_clip_end = self.seek_clips[self.clip_idx]
            if self.seek < seek_clip_start:
                self.seek = seek_clip_start
            if self.seek >= seek_clip_end:
                self.clip_idx += 1
                if self.clip_idx < len(self.seek_clips):
                    self.seek = self.seek_clips[self.clip_idx][0]
                continue
            segment_size = min(
                N_FRAMES, self.content_frames - self.seek,
                seek_clip_end - self.seek,
            )
            self._segment_size = segment_size
            return self.seek, segment_size
        return None

    def current_window(self) -> Optional[np.ndarray]:
        """The next 30s mel window (advancing clip bookkeeping), or None."""
        spec = self.advance_window()
        if spec is None:
            return None
        seek, segment_size = spec
        mel_segment = self.mel[:, seek : seek + segment_size]
        if isinstance(mel_segment, np.ndarray):
            mel_segment = pad_or_trim(mel_segment, N_FRAMES, axis=-1).astype(
                np.float32
            )
        else:  # device slice: pad on device, no host round-trip
            if segment_size < N_FRAMES:
                mel_segment = jnp.pad(
                    mel_segment, ((0, 0), (0, N_FRAMES - segment_size))
                )
            mel_segment = mel_segment.astype(jnp.float32)
        self._mel_segment = mel_segment
        return mel_segment

    @property
    def done(self) -> bool:
        return self.clip_idx >= len(self.seek_clips)

    # -- result consumption ---------------------------------------------------

    def consume(self, result: DecodingResult) -> None:
        """Apply a decode result for the window last emitted by
        ``current_window()`` (reference transcribe.py:303-523)."""
        tokenizer = self.tokenizer
        segment_size = self._segment_size
        seek = self.seek
        time_offset = float(seek * HOP_LENGTH / SAMPLE_RATE)
        window_end_time = float((seek + N_FRAMES) * HOP_LENGTH / SAMPLE_RATE)
        segment_duration = segment_size * HOP_LENGTH / SAMPLE_RATE
        tokens = np.array(result.tokens)

        def new_segment(*, start, end, tokens_, result):
            tokens_ = [int(t) for t in tokens_]
            text_tokens = [t for t in tokens_ if t < tokenizer.eot]
            return {
                "seek": seek,
                "start": start,
                "end": end,
                "text": tokenizer.decode(text_tokens),
                "tokens": tokens_,
                "temperature": result.temperature,
                "avg_logprob": result.avg_logprob,
                "compression_ratio": result.compression_ratio,
                "no_speech_prob": result.no_speech_prob,
            }

        if self.no_speech_threshold is not None:
            # no voice activity check
            should_skip = result.no_speech_prob > self.no_speech_threshold
            if (
                self.logprob_threshold is not None
                and result.avg_logprob > self.logprob_threshold
            ):
                should_skip = False
            if should_skip:
                self.seek += segment_size  # fast-forward to the next boundary
                return

        previous_seek = seek
        current_segments: List[dict] = []

        def word_anomaly_score(word: dict) -> float:
            probability = word.get("probability", 0.0)
            duration = word["end"] - word["start"]
            score = 0.0
            if probability < 0.15:
                score += 1.0
            if duration < 0.133:
                score += (0.133 - duration) * 15
            if duration > 2.0:
                score += duration - 2.0
            return score

        def is_segment_anomaly(segment: Optional[dict]) -> bool:
            if segment is None or not segment["words"]:
                return False
            words = [
                w for w in segment["words"] if w["word"] not in self.punctuation
            ]
            words = words[:8]
            score = sum(word_anomaly_score(w) for w in words)
            return score >= 3 or score + 0.01 >= len(words)

        def next_words_segment(segments: List[dict]) -> Optional[dict]:
            return next((s for s in segments if s["words"]), None)

        timestamp_tokens = tokens >= tokenizer.timestamp_begin
        single_timestamp_ending = (
            len(timestamp_tokens) >= 2
            and timestamp_tokens[-2:].tolist() == [False, True]
        )

        consecutive = np.where(timestamp_tokens[:-1] & timestamp_tokens[1:])[0] + 1
        if len(consecutive) > 0:
            # output contains two consecutive timestamp tokens
            slices = consecutive.tolist()
            if single_timestamp_ending:
                slices.append(len(tokens))
            last_slice = 0
            for current_slice in slices:
                sliced_tokens = tokens[last_slice:current_slice]
                start_timestamp_pos = (
                    int(sliced_tokens[0]) - tokenizer.timestamp_begin
                )
                end_timestamp_pos = (
                    int(sliced_tokens[-1]) - tokenizer.timestamp_begin
                )
                current_segments.append(
                    new_segment(
                        start=time_offset + start_timestamp_pos * self.time_precision,
                        end=time_offset + end_timestamp_pos * self.time_precision,
                        tokens_=sliced_tokens,
                        result=result,
                    )
                )
                last_slice = current_slice
            if single_timestamp_ending:
                # no speech after the last timestamp
                self.seek += segment_size
            else:
                # ignore the unfinished segment; seek to the last timestamp
                last_timestamp_pos = (
                    int(tokens[last_slice - 1]) - tokenizer.timestamp_begin
                )
                self.seek += last_timestamp_pos * self.input_stride
        else:
            duration = segment_duration
            timestamps = tokens[np.nonzero(timestamp_tokens)[0]]
            if (
                len(timestamps) > 0
                and int(timestamps[-1]) != tokenizer.timestamp_begin
            ):
                last_timestamp_pos = (
                    int(timestamps[-1]) - tokenizer.timestamp_begin
                )
                duration = last_timestamp_pos * self.time_precision
            current_segments.append(
                new_segment(
                    start=time_offset,
                    end=time_offset + duration,
                    tokens_=tokens,
                    result=result,
                )
            )
            self.seek += segment_size

        if self.word_timestamps:
            from olmoasr_tpu.timing import add_word_timestamps

            add_word_timestamps(
                segments=current_segments,
                model=self.model,
                tokenizer=tokenizer,
                mel=jnp.asarray(self._mel_segment),
                num_frames=segment_size,
                prepend_punctuations=self.prepend_punctuations,
                append_punctuations=self.append_punctuations,
                last_speech_timestamp=self.last_speech_timestamp,
            )
            if not single_timestamp_ending:
                last_word_end = _get_end(current_segments)
                if last_word_end is not None and last_word_end > time_offset:
                    self.seek = round(last_word_end * FRAMES_PER_SECOND)

            if self.hallucination_silence_threshold is not None:
                threshold = self.hallucination_silence_threshold
                if not single_timestamp_ending:
                    last_word_end = _get_end(current_segments)
                    if last_word_end is not None and last_word_end > time_offset:
                        remaining_duration = window_end_time - last_word_end
                        if remaining_duration > threshold:
                            self.seek = round(last_word_end * FRAMES_PER_SECOND)
                        else:
                            self.seek = previous_seek + segment_size

                first_segment = next_words_segment(current_segments)
                if first_segment is not None and is_segment_anomaly(first_segment):
                    gap = first_segment["start"] - time_offset
                    if gap > threshold:
                        self.seek = previous_seek + round(gap * FRAMES_PER_SECOND)
                        return

                hal_last_end = self.last_speech_timestamp
                for si in range(len(current_segments)):
                    segment = current_segments[si]
                    if not segment["words"]:
                        continue
                    if is_segment_anomaly(segment):
                        next_segment = next_words_segment(
                            current_segments[si + 1 :]
                        )
                        if next_segment is not None:
                            hal_next_start = next_segment["words"][0]["start"]
                        else:
                            hal_next_start = time_offset + segment_duration
                        silence_before = (
                            segment["start"] - hal_last_end > threshold
                            or segment["start"] < threshold
                            or segment["start"] - time_offset < 2.0
                        )
                        silence_after = (
                            hal_next_start - segment["end"] > threshold
                            or is_segment_anomaly(next_segment)
                            or window_end_time - segment["end"] < 2.0
                        )
                        if silence_before and silence_after:
                            self.seek = round(
                                max(time_offset + 1, segment["start"])
                                * FRAMES_PER_SECOND
                            )
                            if self.content_duration - segment["end"] < threshold:
                                self.seek = self.content_frames
                            current_segments[si:] = []
                            break
                    hal_last_end = segment["end"]

            last_word_end = _get_end(current_segments)
            if last_word_end is not None:
                self.last_speech_timestamp = last_word_end

        if self.verbose:
            for segment in current_segments:
                start, end, text = segment["start"], segment["end"], segment["text"]
                line = (
                    f"[{format_timestamp(start)} --> {format_timestamp(end)}] {text}"
                )
                print(make_safe(line))

        # an instantaneous or empty segment is cleared
        for i, segment in enumerate(current_segments):
            if segment["start"] == segment["end"] or segment["text"].strip() == "":
                segment["text"] = ""
                segment["tokens"] = []
                segment["words"] = []

        self.all_segments.extend(
            {"id": i, **segment}
            for i, segment in enumerate(
                current_segments, start=len(self.all_segments)
            )
        )
        self.all_tokens.extend(
            token for segment in current_segments for token in segment["tokens"]
        )

        if not self.condition_on_previous_text or result.temperature > 0.5:
            self.prompt_reset_since = len(self.all_tokens)

    def finalize(self) -> dict:
        return dict(
            text=self.tokenizer.decode(
                self.all_tokens[len(self.initial_prompt_tokens) :]
            ),
            segments=self.all_segments,
            language=self.language,
        )


def _resolve_language(model, mel_or_audio, decode_options, verbose):
    if decode_options.get("language", None) is None:
        if not model.is_multilingual:
            decode_options["language"] = "en"
        else:
            mel = log_mel_spectrogram(mel_or_audio, model.dims.n_mels, padding=N_SAMPLES)
            mel_segment = pad_or_trim(np.asarray(mel), N_FRAMES, axis=-1)
            _, probs = model.detect_language(jnp.asarray(mel_segment))
            decode_options["language"] = max(probs, key=probs.get)
            if verbose is not None:
                print(
                    f"Detected language: {LANGUAGES[decode_options['language']].title()}"
                )
    return decode_options["language"]


def _needs_fallback(
    result: DecodingResult,
    compression_ratio_threshold: Optional[float],
    logprob_threshold: Optional[float],
    no_speech_threshold: Optional[float],
) -> bool:
    """Fallback gates of reference transcribe.py:205-231."""
    needs = False
    if (
        compression_ratio_threshold is not None
        and result.compression_ratio > compression_ratio_threshold
    ):
        needs = True  # too repetitive
    if logprob_threshold is not None and result.avg_logprob < logprob_threshold:
        needs = True  # average log probability too low
    if (
        no_speech_threshold is not None
        and result.no_speech_prob > no_speech_threshold
        and logprob_threshold is not None
        and result.avg_logprob < logprob_threshold
    ):
        needs = False  # silence
    return needs


# ---------------------------------------------------------------------------
# Streamed long-form mel: upload 30s PCM slices, mel them incrementally, and
# normalize at gather time — so the host->device transfer (the long-form wall
# on a remote chip: 32x120s int16 = 123MB at ~20MB/s) hides behind the decode
# rounds instead of blocking as a prefix. Matches the reference exactly: the
# whole-file log-spec max only enters via the `max(x, filemax - 8)` clamp, so
# a window gathered with a stale (still-uploading) running max is bit-equal
# to the sequential path unless some valid frame actually falls below
# final_max - 8 — which the gather records (win_min / used_max) and
# ``transcribe_many`` re-checks at the end, re-running the rare affected file
# through the plain per-file path. Ref hot loop: olmoasr/transcribe.py:281-517.

_CHUNK_HALO = N_FFT - HOP_LENGTH  # 240: frame t reads [t*hop, t*hop + n_fft)


@functools.partial(_jax.jit, donate_argnums=(0, 1))
def _mel_write(buf, rowmax, chunk, fstart):
    """Mel one self-contained PCM chunk and write its frames into the
    per-group unnormalized log-spec buffer (donated: updates in place)."""
    mel, mx = log_mel_chunk_unnorm(chunk, buf.shape[1])
    buf = _jax.lax.dynamic_update_slice(buf, mel, (0, 0, fstart))
    return buf, jnp.maximum(rowmax, mx)


@_jax.jit
def _tail_chunk(halo):
    """Device-built final chunk: the last 200 content samples + the 30s zero
    pad + reflect tail (zeros) — two slices of frames for the cost of a 13KB
    halo upload instead of 60MB of literal zeros."""
    if halo.dtype == jnp.int16:
        halo = halo.astype(jnp.float32) / 32768.0
    return jnp.pad(halo, ((0, 0), (0, 2 * N_SAMPLES + _CHUNK_HALO - halo.shape[1])))


class _StreamedMelGroup:
    """One group of stacked long-form files streaming through the mel.

    Host side: per-slice PCM chunks (with reflect head / inter-slice halo /
    zero tail) are dispatched to the device immediately (`jax.device_put` is
    async — transfers stream on the DMA engine while the device decodes);
    ``ensure``/``poll`` enqueue the mel-write program per chunk, lazily, so
    the in-order compute stream never blocks on a transfer that decode
    doesn't need yet.
    """

    @staticmethod
    def _put(chunk: np.ndarray):
        """Dispatch one built chunk (int16 PCM when _build_chunk could
        convert it exactly — HALF the host->device bytes, the long-form
        bottleneck on a remote/tunneled chip, ~40MB/s single-stream;
        perf/probe_h2d.py). Bit-exact: the /32768 rescale happens on device
        (log_mel_chunk_unnorm / _tail_chunk)."""
        return _jax.device_put(chunk)

    @staticmethod
    def _cvt_i16(dst: np.ndarray, src: np.ndarray) -> bool:
        """Exact f32->int16 PCM conversion, blockwise: writes
        ``rint(src*32768)`` into ``dst`` and returns False iff any value is
        out of int16 range or not exactly representable (then the chunk
        falls back to f32 transport). 4MB temporaries instead of
        whole-chunk f32 copies: the old 3x-61MB-per-chunk temporaries cost
        1.8-4.3s/chunk in mmap page-fault churn on a 1-core host
        (perf/probe_prefix.py) and sat on the blocking prefix."""
        B = 1 << 20
        for o in range(0, src.size, B):
            s = src[o : o + B] * np.float32(32768.0)
            r = np.rint(s)
            if not (
                r.min() >= -32768.0
                and r.max() <= 32767.0
                and np.array_equal(r, s)
            ):
                return False
            dst[o : o + B] = r
        return True

    def _build_chunk(self, pcm_rows, s: int) -> np.ndarray:
        """Assemble the host-side sample buffer for chunk ``s`` (slice s of
        every row, with the reflect head on slice 0) or, for ``s ==
        n_real``, the 13KB tail halo that _tail_chunk expands on device.
        f32 rows build DIRECTLY into an int16 buffer (exactness checked
        blockwise by _cvt_i16); only non-PCM-representable audio rebuilds
        in f32."""
        n_rows = len(pcm_rows)
        dtype = pcm_rows[0].dtype
        try_i16 = dtype == np.float32
        if try_i16:
            dtype = np.int16
        max_len = self.n_real * N_SAMPLES
        if s == self.n_real:
            halo = np.zeros((n_rows, N_FFT // 2), dtype)
            for j, x in enumerate(pcm_rows):
                if len(x) > max_len - N_FFT // 2:
                    tail = x[max_len - N_FFT // 2 :]
                    if try_i16:
                        if not self._cvt_i16(halo[j, : len(tail)], tail):
                            return self._build_f32(pcm_rows, s)
                    else:
                        halo[j, : len(tail)] = tail
            return halo
        chunk = np.zeros((n_rows, N_SAMPLES + _CHUNK_HALO), dtype)
        lo = s * N_SAMPLES - (N_FFT // 2)
        hi = (s + 1) * N_SAMPLES + (_CHUNK_HALO - N_FFT // 2)
        for j, x in enumerate(pcm_rows):
            if s == 0:
                # reflect head of the zero-padded row (np.pad 'reflect'):
                # head position p = padded_row[200 - p]
                pr = x if len(x) > N_FFT // 2 else np.concatenate(
                    [x, np.zeros(N_FFT // 2 + 1 - len(x), x.dtype)]
                )
                head = pr[1 : N_FFT // 2 + 1][::-1]
                body = x[:hi]
                if try_i16:
                    if not (
                        self._cvt_i16(chunk[j, : N_FFT // 2], head)
                        and self._cvt_i16(
                            chunk[j, N_FFT // 2 : N_FFT // 2 + len(body)],
                            body,
                        )
                    ):
                        return self._build_f32(pcm_rows, s)
                else:
                    chunk[j, : N_FFT // 2] = head
                    chunk[j, N_FFT // 2 : N_FFT // 2 + len(body)] = body
            else:
                body = x[lo : min(hi, len(x))]
                if try_i16:
                    if not self._cvt_i16(chunk[j, : len(body)], body):
                        return self._build_f32(pcm_rows, s)
                else:
                    chunk[j, : len(body)] = body
        return chunk

    def _build_f32(self, pcm_rows, s: int) -> np.ndarray:
        """Fallback: the original f32 assembly, for rows whose samples are
        not exactly int16-representable (synthetic f32 audio)."""
        n_rows = len(pcm_rows)
        max_len = self.n_real * N_SAMPLES
        if s == self.n_real:
            halo = np.zeros((n_rows, N_FFT // 2), np.float32)
            for j, x in enumerate(pcm_rows):
                if len(x) > max_len - N_FFT // 2:
                    tail = x[max_len - N_FFT // 2 :]
                    halo[j, : len(tail)] = tail
            return halo
        chunk = np.zeros((n_rows, N_SAMPLES + _CHUNK_HALO), np.float32)
        lo = s * N_SAMPLES - (N_FFT // 2)
        hi = (s + 1) * N_SAMPLES + (_CHUNK_HALO - N_FFT // 2)
        for j, x in enumerate(pcm_rows):
            if s == 0:
                pr = x if len(x) > N_FFT // 2 else np.concatenate(
                    [x, np.zeros(N_FFT // 2 + 1 - len(x), x.dtype)]
                )
                chunk[j, : N_FFT // 2] = pr[1 : N_FFT // 2 + 1][::-1]
                body = x[:hi]
                chunk[j, N_FFT // 2 : N_FFT // 2 + len(body)] = body
            else:
                body = x[lo : min(hi, len(x))]
                chunk[j, : len(body)] = body
        return chunk

    def __init__(self, pcm_rows, max_len, n_mels):
        self.n_real = max_len // N_SAMPLES
        self.total_frames = (self.n_real + 2) * N_FRAMES
        n_rows = len(pcm_rows)
        self.chunks = [None] * (self.n_real + 1)
        self._dispatched = [threading.Event() for _ in self.chunks]
        self._builder_err = None
        # Chunk 0 builds + dispatches synchronously: the first decode round
        # blocks on it anyway, and its transfer must head the single-stream
        # tunnel queue. Everything else builds on a BACKGROUND thread — the
        # per-chunk host work (slice copies + the PCM16 round-trip check,
        # ~1.5s for 32x120s on this 1-core host) runs while the main thread
        # blocks inside decode dispatches (GIL released), instead of
        # lengthening the blocking prefix as a build-everything __init__.
        self.chunks[0] = self._put(self._build_chunk(pcm_rows, 0))
        self._dispatched[0].set()

        def _build_rest():
            try:
                for s in range(1, self.n_real + 1):
                    self.chunks[s] = self._put(self._build_chunk(pcm_rows, s))
                    self._dispatched[s].set()
            except BaseException as e:  # surfaced by _wait_dispatched
                self._builder_err = e
                for ev in self._dispatched:
                    ev.set()

        if self.n_real >= 1:
            threading.Thread(target=_build_rest, daemon=True).start()
        self.buf = jnp.zeros((n_rows, n_mels, self.total_frames), jnp.float32)
        self.rowmax = jnp.full((n_rows,), -1e30, jnp.float32)
        self.done = 0  # mel-writes enqueued for chunks [0, done)

    @property
    def complete(self) -> bool:
        return self.done > self.n_real

    def _wait_dispatched(self, s: int) -> None:
        self._dispatched[s].wait()
        if self._builder_err is not None:
            raise self._builder_err

    def _enqueue(self, s: int) -> None:
        chunk = self.chunks[s]
        if s == self.n_real:
            chunk = _tail_chunk(chunk)
        self.buf, self.rowmax = _mel_write(
            self.buf, self.rowmax, chunk, jnp.int32(s * N_FRAMES)
        )
        self.chunks[s] = None  # release the device PCM once consumed

    def ensure(self, last_frame: int) -> None:
        """Enqueue mel-writes covering frames [0, last_frame] (blocking the
        device stream on their transfers if they haven't arrived — they are
        needed NOW)."""
        need = min(last_frame // N_FRAMES, self.n_real)
        while self.done <= need:
            self._wait_dispatched(self.done)
            self._enqueue(self.done)
            self.done += 1

    def poll(self) -> None:
        """Opportunistically enqueue mel-writes for chunks whose transfer has
        completed — keeps the running max marching toward the file max (so
        later gathers are exact) without ever stalling the compute stream."""
        while self.done <= self.n_real:
            if not self._dispatched[self.done].is_set():
                return
            if self._builder_err is not None:
                raise self._builder_err
            chunk = self.chunks[self.done]
            try:
                if not chunk.is_ready():
                    return
            except AttributeError:  # CPU arrays / older jax: always ready
                pass
            self._enqueue(self.done)
            self.done += 1

    def finish(self) -> None:
        while self.done <= self.n_real:
            self._wait_dispatched(self.done)
            self._enqueue(self.done)
            self.done += 1


@_jax.jit
def _gather_windows_norm(stack, rowmax, rows, seeks, seg_sizes):
    """ONE device call gathering + NORMALIZING windows from an unnormalized
    streamed-group buffer:
    window j = (max(stack[rows[j], :, seeks[j]:+3000], rowmax[rows[j]] - 8)
    + 4) / 4 with frames >= seg_sizes[j] zeroed. Also returns, per window,
    the min over its valid frames and the max it was normalized with — the
    exactness guard transcribe_many re-checks once the true file max is
    known."""

    def one(r, s, z):
        w = _jax.lax.dynamic_slice(
            stack, (r, 0, s), (1, stack.shape[1], N_FRAMES)
        )[0]
        m = rowmax[r]
        wn = (jnp.maximum(w, m - 8.0) + 4.0) / 4.0
        mask = jnp.arange(N_FRAMES) < z
        win = jnp.where(mask[None, :], wn, 0.0)
        wmin = jnp.min(jnp.where(mask[None, :], w, jnp.inf))
        return win, wmin, m

    return _jax.vmap(one)(rows, seeks, seg_sizes)


def _decode_batch_with_fallback(
    model: "OLMoASR",
    windows: List[np.ndarray],
    temperatures: List[float],
    decode_options: dict,
    *,
    compression_ratio_threshold: Optional[float],
    logprob_threshold: Optional[float],
    no_speech_threshold: Optional[float],
    pad_to: Optional[int] = None,
) -> List[DecodingResult]:
    """Batched temperature-fallback ladder (SURVEY §7.2): decode ALL windows
    at t=0 in one batched call, then re-queue only the failures at each higher
    temperature. ``pad_to`` pads every batch to a fixed row count so one XLA
    program serves all rounds (3-10 min per fresh shape on the remote tunnel).
    """
    stacked_input = not isinstance(windows, (list, tuple))
    n = int(windows.shape[0]) if stacked_input else len(windows)
    results: List[Optional[DecodingResult]] = [None] * n
    pending = list(range(n))
    for ti, t in enumerate(temperatures):
        if not pending:
            break
        kwargs = {**decode_options}
        if t > 0:
            kwargs.pop("beam_size", None)
            kwargs.pop("patience", None)
        else:
            kwargs.pop("best_of", None)
        options = DecodingOptions(**kwargs, temperature=t)

        n_real = len(pending)
        if stacked_input:
            # one take op (pad rows repeat the last pending window)
            idx = pending + [pending[-1]] * (max(pad_to or 0, n_real) - n_real)
            batch = windows if (idx == list(range(n))) else windows[
                jnp.asarray(idx, jnp.int32)
            ]
            out = model.decode(batch, options)
        else:
            batch = [windows[i] for i in pending]
            if pad_to and n_real < pad_to:
                batch.extend([batch[-1]] * (pad_to - n_real))
            out = model.decode(jnp.stack(batch), options)
        if not isinstance(out, list):
            out = [out]
        out = out[:n_real]

        still = []
        last = ti == len(temperatures) - 1
        for i, r in zip(pending, out):
            results[i] = r
            if not last and _needs_fallback(
                r, compression_ratio_threshold, logprob_threshold,
                no_speech_threshold,
            ):
                still.append(i)
        pending = still
    return results  # type: ignore[return-value]


def transcribe(
    model: "OLMoASR",
    audio: Union[str, np.ndarray],
    *,
    verbose: Optional[bool] = None,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    initial_prompt: Optional[str] = None,
    carry_initial_prompt: bool = False,
    word_timestamps: bool = False,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    clip_timestamps: Union[str, List[float]] = "0",
    hallucination_silence_threshold: Optional[float] = None,
    **decode_options,
):
    """Transcribe audio of arbitrary length. Returns ``{text, segments, language}``
    with the segment schema of ``/root/reference/README.md:193-247``."""
    results = transcribe_many(
        model,
        [audio],
        batch_size=1,
        verbose=verbose,
        temperature=temperature,
        compression_ratio_threshold=compression_ratio_threshold,
        logprob_threshold=logprob_threshold,
        no_speech_threshold=no_speech_threshold,
        condition_on_previous_text=condition_on_previous_text,
        initial_prompt=initial_prompt,
        carry_initial_prompt=carry_initial_prompt,
        word_timestamps=word_timestamps,
        prepend_punctuations=prepend_punctuations,
        append_punctuations=append_punctuations,
        clip_timestamps=clip_timestamps,
        hallucination_silence_threshold=hallucination_silence_threshold,
        **decode_options,
    )
    return results[0]


def transcribe_many(
    model: "OLMoASR",
    audios: List[Union[str, np.ndarray]],
    *,
    batch_size: int = 8,
    verbose: Optional[bool] = None,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    initial_prompt: Optional[str] = None,
    carry_initial_prompt: bool = False,
    word_timestamps: bool = False,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    clip_timestamps: Union[str, List[float]] = "0",
    hallucination_silence_threshold: Optional[float] = None,
    **decode_options,
) -> List[dict]:
    """Batched long-form transcription of MANY files on one chip.

    The TPU-native replacement for looping reference ``transcribe`` per file:
    every active file contributes its current 30s window, the windows decode
    as ONE batch (windows from different files are independent), and only the
    windows failing the fallback gates re-queue at higher temperatures
    (SURVEY §7.2). Per-file output is identical to ``transcribe`` — the seek
    state machines are independent.
    """
    if word_timestamps and decode_options.get("task") == "translate":
        warnings.warn("Word-level timestamps on translations may not be reliable.")

    import os as _os
    import time as _time

    _perf = _os.environ.get("OLMOASR_PERF_TIMERS", "0") == "1"
    _t_enter = _time.perf_counter()

    temperatures = (
        [temperature] if isinstance(temperature, (int, float)) else list(temperature)
    )

    # Batch the log-mel STFT of all in-memory waveforms into ONE device call
    # (quantized to 30s length buckets so the jit shape is stable). Paths and
    # very long files fall back to the per-file path.
    from olmoasr_tpu.audio import load_audio

    wavs = [load_audio(a) if isinstance(a, str) else np.asarray(a) for a in audios]
    mels: List[Optional[np.ndarray]] = [None] * len(wavs)
    # the STFT materializes (B, frames, 400) f32 + complex intermediates on
    # device (~5.5x the padded audio bytes): cap the per-file length and the
    # per-group sample budget so a batch of hour-long files cannot OOM the
    # chip; oversized files fall back to the per-file path
    MAX_FILE_S = 10 * 60
    GROUP_BUDGET = 128 * 10**6  # samples per batched STFT call (~3GB interm.)
    batchable = [
        i for i, w in enumerate(wavs)
        if w.ndim == 1 and len(w) <= MAX_FILE_S * SAMPLE_RATE
    ]
    # Streamed upload/decode overlap (r5, superseding the r4 whole-file
    # group overlap): the PCM is split into GROUPS of up to ``batch_size``
    # files AND each group's rows into 30s SLICES. Every slice chunk's
    # host->device transfer is dispatched up-front (device_put is async —
    # transfers stream on the DMA engine while the device decodes, measured
    # full overlap through the axon tunnel, perf/probe_h2d.py), but the mel
    # program per chunk is enqueued lazily — a round blocks only on the
    # slices its windows actually read (round r reads slice ~r), so the
    # 123MB 32x120s upload that was a 5.9s blocking prefix in r4 hides
    # behind the decode rounds. Normalization moves to gather time (see
    # _StreamedMelGroup); outputs stay bit-equal to sequential transcribe,
    # enforced by the stale-max guard + per-file rerun below.
    # NOTE a smaller per_group (batch_size//4) with one-group-per-round
    # admission was measured NET NEGATIVE (174.6 vs 314.7 RTFx,
    # perf/r4_longform1.log): underfilled rounds still pay the padded
    # batch decode, costing more than the hidden upload saved.
    groups: List[_StreamedMelGroup] = []
    stack_row = {}  # file index -> (group, row in group)
    mel_frames = {}  # file index -> valid frame count (content + N_FRAMES)
    gather_w = 0  # fixed per-group gather width (one program for all rounds)
    guards: List[Tuple[int, List[int], object, object]] = []
    if len(batchable) > 1:
        max_len = max(len(wavs[i]) for i in batchable)
        max_len = -(-max_len // N_SAMPLES) * N_SAMPLES  # round up to 30s
        per_group = max(int(GROUP_BUDGET // max_len), 1)
        per_group = max(1, min(per_group, batch_size))
        # never pad a group wider than the actual file count: with few files
        # the budget cap (e.g. 266 rows of 30s audio) would upload hundreds
        # of zero rows and run the STFT over them (advisor r4). One shape is
        # preserved — clamping by a call-wide constant keeps every group of
        # this call at the same width.
        per_group = min(per_group, len(batchable))
        # PCM-16 transport happens per-CHUNK inside _StreamedMelGroup._put
        # (int16 when exactly representable, halving the upload bytes); no
        # whole-call pre-pass — the first slice's transfer starts as soon as
        # its own chunk is built, and the remaining chunks' host work
        # overlaps it.
        gather_w = min(per_group, batch_size)

        for gi, g in enumerate(range(0, len(batchable), per_group)):
            group = batchable[g : g + per_group]
            rows = []
            for j, i in enumerate(group):
                rows.append(wavs[i])
                stack_row[i] = (gi, j)
                mel_frames[i] = len(wavs[i]) // HOP_LENGTH + N_FRAMES
            # every group padded to per_group rows: one shape -> one mel
            # program and one gather program for ALL groups
            while len(rows) < per_group:
                rows.append(np.zeros(0, np.float32))
            groups.append(
                _StreamedMelGroup(rows, max_len, model.dims.n_mels)
            )

    if groups and _perf:
        # the BLOCKING prefix is now just group 0's first slice (everything
        # else uploads behind the decode rounds); a scalar fetch forces a
        # real sync — block_until_ready can return early through the tunnel
        groups[0].ensure(0)
        _ = float(np.asarray(groups[0].rowmax[0]))
        PERF_TIMERS["mel_stack_s"] = _time.perf_counter() - _t_enter

    states: List[_FileState] = []
    for fi, (audio, wav, mel) in enumerate(zip(audios, wavs, mels)):
        opts = dict(decode_options)
        language = _resolve_language(model, wav, opts, verbose)
        tokenizer = get_tokenizer(
            model.is_multilingual,
            num_languages=model.num_languages,
            language=language,
            task=opts.get("task", "transcribe"),
        )
        states.append(
            _FileState(
                model, wav, tokenizer,
                verbose=verbose,
                compression_ratio_threshold=compression_ratio_threshold,
                logprob_threshold=logprob_threshold,
                no_speech_threshold=no_speech_threshold,
                condition_on_previous_text=condition_on_previous_text,
                initial_prompt=initial_prompt,
                word_timestamps=word_timestamps,
                prepend_punctuations=prepend_punctuations,
                append_punctuations=append_punctuations,
                clip_timestamps=clip_timestamps,
                hallucination_silence_threshold=hallucination_silence_threshold,
                language=language,
                precomputed_mel=mel,
                mel_frames=mel_frames.get(fi),
            )
        )

    # round-based: each round batches the current window of up to batch_size
    # active files; languages may differ per file, so group by language.
    # Stack-backed files advance bookkeeping only and their windows are
    # gathered in ONE device call (_gather_windows_norm); others slice per file.
    active = list(range(len(states)))
    while active:
        round_ids = active[:batch_size]
        specs, windows, ids = [], [], []
        for i in round_ids:
            if i in stack_row:
                spec = states[i].advance_window()
                if spec is None:
                    continue
                # (group, row, seek, size, file)
                specs.append((*stack_row[i], *spec, i))
                windows.append(None)  # filled from the gathered batch below
            else:
                w = states[i].current_window()
                if w is None:
                    continue
                windows.append(w)
            ids.append(i)
        if specs:
            # one fixed-width gather per touched group (file order == group
            # order, so per-group chunks concatenate back in spec order)
            parts = []
            for gi in sorted({s[0] for s in specs}):
                gs = [s[1:4] for s in specs if s[0] == gi]
                gids = [s[4] for s in specs if s[0] == gi]
                grp = groups[gi]
                # block only on the slices this round's windows actually
                # read; later chunks keep streaming behind the decode
                grp.ensure(max(s[1] for s in gs) + N_FRAMES - 1)
                padded = gs + [gs[-1]] * (gather_w - len(gs))
                rows, seeks, sizes = (
                    jnp.asarray(c, jnp.int32) for c in zip(*padded)
                )
                wins, wmin, umax = _gather_windows_norm(
                    grp.buf, grp.rowmax, rows, seeks, sizes
                )
                if not grp.complete:
                    # normalized with a still-running max: record the guard
                    # inputs; re-checked against the final max at the end
                    guards.append(
                        (gi, gids, wmin[: len(gs)], umax[: len(gs)])
                    )
                parts.append(wins[: len(gs)])
            gathered = (
                parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            )
            g = 0
            for j, w in enumerate(windows):
                if w is None:
                    windows[j] = ("gathered", g)
                    g += 1
        if windows:
            by_lang: dict = {}
            for w, i in zip(windows, ids):
                by_lang.setdefault(states[i].language, ([], []))
                by_lang[states[i].language][0].append(w)
                by_lang[states[i].language][1].append(i)
            for lang, (ws, iids) in by_lang.items():
                opts = {**decode_options, "language": lang}
                if all(isinstance(w, tuple) for w in ws):
                    g_idx = [w[1] for w in ws]
                    ws_arg = (
                        gathered if g_idx == list(range(gathered.shape[0]))
                        else gathered[jnp.asarray(g_idx, jnp.int32)]
                    )
                else:  # mixed round: materialize the gathered rows
                    ws_arg = [
                        gathered[w[1]] if isinstance(w, tuple) else w for w in ws
                    ]
                results = _decode_batch_with_fallback(
                    model, ws_arg, temperatures, opts,
                    compression_ratio_threshold=compression_ratio_threshold,
                    logprob_threshold=logprob_threshold,
                    no_speech_threshold=no_speech_threshold,
                    pad_to=batch_size if len(states) > 1 else None,
                )
                for k, (i, r) in enumerate(zip(iids, results)):
                    if word_timestamps and isinstance(ws[k], tuple):
                        # lazy row slice, only when the DTW path needs it
                        states[i]._mel_segment = gathered[ws[k][1]]
                    states[i].consume(r)
        active = [i for i in active if not states[i].done]
        for grp in groups:
            # enqueue mel-writes for any chunks that arrived during this
            # round's decode — marches the running max toward the file max
            # so later gathers are exact, without stalling the stream
            grp.poll()

    finals = [s.finalize() for s in states]

    if guards:
        # stale-max exactness check: a window normalized before its file's
        # upload completed is bit-equal to the sequential path unless some
        # valid frame fell below final_max - 8 while used_max != final_max
        # (the clamp floor then differed). Re-run those (rare) files through
        # the plain per-file path — identical semantics, full fidelity.
        for grp in groups:
            grp.finish()
        fmax = {gi: np.asarray(groups[gi].rowmax) for gi, *_ in guards}
        bad = set()
        for gi, gids, wmin, umax in guards:
            wm, um = np.asarray(wmin), np.asarray(umax)
            for k, i in enumerate(gids):
                fm = fmax[gi][stack_row[i][1]]
                if um[k] != fm and wm[k] < fm - 8.0:
                    bad.add(i)
        if bad and _perf:
            PERF_TIMERS["stale_max_reruns"] = len(bad)
        for i in sorted(bad):
            finals[i] = transcribe(
                model, wavs[i], verbose=verbose, temperature=temperature,
                compression_ratio_threshold=compression_ratio_threshold,
                logprob_threshold=logprob_threshold,
                no_speech_threshold=no_speech_threshold,
                condition_on_previous_text=condition_on_previous_text,
                initial_prompt=initial_prompt,
                carry_initial_prompt=carry_initial_prompt,
                word_timestamps=word_timestamps,
                prepend_punctuations=prepend_punctuations,
                append_punctuations=append_punctuations,
                clip_timestamps=clip_timestamps,
                hallucination_silence_threshold=hallucination_silence_threshold,
                **decode_options,
            )

    return finals


def _get_end(segments: List[dict]) -> Optional[float]:
    return next(
        (w["end"] for s in reversed(segments) for w in reversed(s.get("words", []))),
        segments[-1]["end"] if segments else None,
    )


def cli():
    """Command-line interface (transcribe.py:526-628 parity)."""
    import argparse

    from olmoasr_tpu import available_models, load_model
    from olmoasr_tpu.writers import get_writer

    def optional_int(s):
        return None if s == "None" else int(s)

    def optional_float(s):
        return None if s == "None" else float(s)

    def str2bool(s):
        return s.lower() in ("true", "1", "yes")

    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("audio", nargs="+", type=str, help="audio file(s) to transcribe")
    parser.add_argument("--model", default="small.en", help="name or path of the model")
    parser.add_argument("--model_dir", type=str, default=None)
    parser.add_argument("--output_dir", "-o", type=str, default=".")
    parser.add_argument(
        "--output_format", "-f", type=str, default="all",
        choices=["txt", "vtt", "srt", "tsv", "json", "all"],
    )
    parser.add_argument("--verbose", type=str2bool, default=True)
    parser.add_argument("--task", type=str, default="transcribe",
                        choices=["transcribe", "translate"])
    parser.add_argument("--language", type=str, default=None,
                        choices=sorted(LANGUAGES.keys()))
    parser.add_argument("--temperature", type=float, default=0)
    parser.add_argument("--best_of", type=optional_int, default=5)
    parser.add_argument("--beam_size", type=optional_int, default=5)
    parser.add_argument("--patience", type=optional_float, default=None)
    parser.add_argument("--length_penalty", type=optional_float, default=None)
    parser.add_argument("--suppress_tokens", type=str, default="-1")
    parser.add_argument("--initial_prompt", type=str, default=None)
    parser.add_argument("--condition_on_previous_text", type=str2bool, default=True)
    parser.add_argument("--temperature_increment_on_fallback", type=optional_float,
                        default=0.2)
    parser.add_argument("--compression_ratio_threshold", type=optional_float,
                        default=2.4)
    parser.add_argument("--logprob_threshold", type=optional_float, default=-1.0)
    parser.add_argument("--no_speech_threshold", type=optional_float, default=0.6)
    parser.add_argument("--word_timestamps", type=str2bool, default=False)
    parser.add_argument("--prepend_punctuations", type=str, default="\"'“¿([{-")
    parser.add_argument("--append_punctuations", type=str,
                        default="\"'.。,，!！?？:：”)]}、")
    parser.add_argument("--highlight_words", type=str2bool, default=False)
    parser.add_argument("--max_line_width", type=optional_int, default=None)
    parser.add_argument("--max_line_count", type=optional_int, default=None)
    parser.add_argument("--max_words_per_line", type=optional_int, default=None)
    parser.add_argument("--clip_timestamps", type=str, default="0")
    parser.add_argument("--hallucination_silence_threshold", type=optional_float,
                        default=None)
    parser.add_argument(
        "--batch_size", type=int, default=1,
        help="files transcribed concurrently (batched windows on one chip); "
        "1 = sequential reference behavior",
    )

    args = parser.parse_args().__dict__
    model_name = args.pop("model")
    model_dir = args.pop("model_dir")
    output_dir = args.pop("output_dir")
    output_format = args.pop("output_format")
    import os

    os.makedirs(output_dir, exist_ok=True)

    temperature = args.pop("temperature")
    if (increment := args.pop("temperature_increment_on_fallback")) is not None:
        temperature = tuple(np.arange(temperature, 1.0 + 1e-6, increment))
    else:
        temperature = [temperature]

    model = load_model(model_name, download_root=model_dir, inference=True)
    writer = get_writer(output_format, output_dir)
    word_options = ["highlight_words", "max_line_count", "max_line_width",
                    "max_words_per_line"]
    writer_args = {k: args.pop(k) for k in word_options}
    batch_size = args.pop("batch_size")
    audio_paths = args.pop("audio")
    if batch_size > 1 and len(audio_paths) > 1:
        results = transcribe_many(
            model, audio_paths, batch_size=batch_size,
            temperature=temperature, **args,
        )
        for audio_path, result in zip(audio_paths, results):
            writer(result, audio_path, **writer_args)
    else:
        for audio_path in audio_paths:
            result = transcribe(model, audio_path, temperature=temperature, **args)
            writer(result, audio_path, **writer_args)


if __name__ == "__main__":
    cli()
