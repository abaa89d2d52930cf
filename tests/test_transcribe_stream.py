"""Streamed long-form mel (r5): slice-wise upload + incremental mel +
gather-time normalization must be BIT-EQUAL to the sequential per-file path.

The stream splits each file's PCM into 30s slices whose mel is computed as
the chunks arrive; the whole-file log-spec max (the reference's
normalization clamp, [pip:whisper] audio.log_mel_spectrogram) is then only
available incrementally. Exactness is preserved by construction (the max
only enters via the ``max(x, filemax - 8)`` clamp) plus a guard that
re-runs any file whose early windows were actually clamp-sensitive
(transcribe.py::_StreamedMelGroup / the guards block in transcribe_many).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from olmoasr_tpu.audio import (
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    log_mel_chunk_unnorm,
    log_mel_spectrogram,
)


def _noise(sec, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(16000 * sec) * scale * 32768
    return np.round(w).clip(-32768, 32767).astype(np.float32) / 32768.0


class TestSliceMelBitExact:
    def test_slice_chunks_match_whole_row(self):
        """Chunked unnormalized mel == whole-row mel, bitwise, both int16
        and f32 transport (same conv kernel, same per-frame dots)."""
        for dtype, scale in ((np.int16, 32768.0), (np.float32, 1.0)):
            rng = np.random.default_rng(3)
            max_len = 2 * N_SAMPLES
            pcm = (rng.standard_normal((2, max_len)) * 0.05 * scale).astype(
                dtype
            )
            whole = np.asarray(
                log_mel_spectrogram(jnp.asarray(pcm), 80, padding=N_SAMPLES)
            )

            # rebuild via the streaming decomposition (transcribe.py chunk
            # layout): reflect head + per-slice halo chunks + zero tail
            halo = N_FFT - HOP_LENGTH
            f32 = pcm.astype(np.float32) / (scale if dtype == np.int16 else 1)
            padded = np.pad(f32, [(0, 0), (0, N_SAMPLES)])
            padded = np.pad(padded, [(0, 0), (N_FFT // 2, N_FFT // 2)], "reflect")
            n_real = max_len // N_SAMPLES
            logs, mx = [], np.full((2,), -1e30, np.float32)
            for s in range(n_real + 1):
                n_sl = 1 if s < n_real else 2
                chunk = padded[
                    :, s * N_SAMPLES : (s + n_sl) * N_SAMPLES + halo
                ]
                ls, m = log_mel_chunk_unnorm(jnp.asarray(chunk), 80)
                logs.append(np.asarray(ls))
                mx = np.maximum(mx, np.asarray(m))
            unnorm = np.concatenate(logs, axis=2)
            norm = (np.maximum(unnorm, mx[:, None, None] - 8.0) + 4.0) / 4.0

            n_cmp = whole.shape[2]  # whole has one more dropped-frame slice
            np.testing.assert_array_equal(norm[:, :, :n_cmp], whole)

    def test_int16_chunk_rescale_matches_f32(self):
        pcm = np.array([[0, 100, -32768, 32767] * 200 * 150], np.int16)
        pad = np.zeros((1, N_SAMPLES + N_FFT - HOP_LENGTH - pcm.shape[1]), np.int16)
        chunk = np.concatenate([pcm, pad], axis=1)
        a, ma = log_mel_chunk_unnorm(jnp.asarray(chunk), 80)
        b, mb = log_mel_chunk_unnorm(
            jnp.asarray(chunk.astype(np.float32) / 32768.0), 80
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))


class TestStreamedTranscribeMany:
    @pytest.fixture(scope="class")
    def model(self):
        from olmoasr_tpu.api import OLMoASR
        from olmoasr_tpu.models.dims import ModelDimensions

        dims = ModelDimensions(
            n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
            n_audio_layer=1, n_vocab=51864, n_text_ctx=448, n_text_state=64,
            n_text_head=4, n_text_layer=1,
        )
        return OLMoASR(dims, inference=True)

    @pytest.fixture(autouse=True)
    def small_sample_len(self, monkeypatch):
        """Cap decode length so the random model doesn't run 224 steps."""
        import olmoasr_tpu.transcribe as T
        from olmoasr_tpu.decoding import DecodingOptions as Orig

        def small(**kw):
            kw.setdefault("sample_len", 12)
            kw.setdefault("fp16", False)
            return Orig(**kw)

        monkeypatch.setattr(T, "DecodingOptions", small)

    KW = dict(
        temperature=0.0, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        without_timestamps=True, beam_size=None, best_of=None,
    )

    def test_mixed_lengths_with_silence_match_sequential(self, model):
        from olmoasr_tpu.transcribe import transcribe, transcribe_many

        wavs = [_noise(s, seed=s) for s in (45, 95, 61)]
        wavs[1][16000 * 40 : 16000 * 55] = 0.0  # digital silence mid-file
        outs = transcribe_many(model, wavs, batch_size=2, **self.KW)
        for i, o in enumerate(outs):
            s = transcribe(model, wavs[i], **self.KW)
            assert o["text"] == s["text"], i
            assert [g["tokens"] for g in o["segments"]] == [
                g["tokens"] for g in s["segments"]
            ], i

    def test_stale_max_guard_reruns_affected_file(self, model, monkeypatch):
        """A file whose round-0 window is clamp-sensitive (digital silence
        in slice 0, the file max in a later slice) must be re-run through
        the per-file path — and still match it exactly. poll() is disabled
        so the running max STAYS stale, forcing the guard."""
        import olmoasr_tpu.transcribe as T

        monkeypatch.setenv("OLMOASR_PERF_TIMERS", "1")
        monkeypatch.setattr(
            T._StreamedMelGroup, "poll", lambda self: None
        )
        quiet = _noise(30, seed=1, scale=0.0005)
        quiet[16000 * 2 : 16000 * 20] = 0.0  # -10 floor bins in slice 0
        loud = _noise(35, seed=2, scale=0.3)  # file max lives in slice 1+
        w = np.concatenate([quiet, loud])
        other = _noise(65, seed=3)
        T.PERF_TIMERS.clear()
        outs = T.transcribe_many(model, [w, other], batch_size=2, **self.KW)
        assert T.PERF_TIMERS.get("stale_max_reruns", 0) >= 1
        for i, wav in enumerate([w, other]):
            s = T.transcribe(model, wav, **self.KW)
            assert outs[i]["text"] == s["text"], i
            assert [g["tokens"] for g in outs[i]["segments"]] == [
                g["tokens"] for g in s["segments"]
            ], i

    def test_chunk_build_int16_direct_vs_f32_fallback(self):
        """_build_chunk builds int16 directly for PCM-representable rows
        (blockwise _cvt_i16) and falls back to f32 otherwise; the int16
        chunk rescaled must equal the f32 assembly of the same rows."""
        from olmoasr_tpu.transcribe import _StreamedMelGroup

        rows = [_noise(61, seed=4), _noise(45, seed=5), np.zeros(0, np.float32)]
        max_len = 3 * N_SAMPLES
        grp = _StreamedMelGroup.__new__(_StreamedMelGroup)
        grp.n_real = max_len // N_SAMPLES
        for s in range(grp.n_real + 1):
            c = grp._build_chunk(rows, s)
            assert c.dtype == np.int16, s
            f = grp._build_f32(rows, s)
            np.testing.assert_array_equal(
                c.astype(np.float32) / 32768.0, f, err_msg=f"chunk {s}"
            )
        # one non-representable row forces the f32 fallback for the chunk
        bad = rows[0].copy()
        bad[7] = 1.0 / 3.0
        c = grp._build_chunk([bad, rows[1]], 0)
        assert c.dtype == np.float32
        np.testing.assert_array_equal(c, grp._build_f32([bad, rows[1]], 0))

    def test_non_pcm_audio_matches_sequential(self, model):
        """End-to-end: raw f32 audio that is NOT int16-representable takes
        the f32 transport and still matches the per-file path exactly."""
        from olmoasr_tpu.transcribe import transcribe, transcribe_many

        rng = np.random.default_rng(11)
        wavs = [
            (rng.standard_normal(16000 * s) * 0.05).astype(np.float32)
            for s in (45, 61)
        ]
        outs = transcribe_many(model, wavs, batch_size=2, **self.KW)
        for i, o in enumerate(outs):
            s = transcribe(model, wavs[i], **self.KW)
            assert o["text"] == s["text"], i

    def test_no_rerun_when_upload_completes(self, model, monkeypatch):
        """Normal case: poll() finishes the group during round 0, later
        gathers use the final max, and no rerun happens."""
        import olmoasr_tpu.transcribe as T

        monkeypatch.setenv("OLMOASR_PERF_TIMERS", "1")
        wavs = [_noise(70, seed=9), _noise(70, seed=10)]
        T.PERF_TIMERS.clear()
        outs = T.transcribe_many(model, wavs, batch_size=2, **self.KW)
        assert "stale_max_reruns" not in T.PERF_TIMERS
        assert len(outs) == 2 and all(o["segments"] for o in outs)
