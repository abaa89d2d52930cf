"""Audio frontend: 16 kHz log-mel spectrogram with the exact Whisper contract.

TPU-native rebuild of the audio pipeline the reference delegates to the
``openai-whisper`` pip package (imported at ``/root/reference/olmoasr/transcribe.py:11-19``
and used in the trainers, e.g. ``scripts/training/train_timestamps.py:175-217``).

Contract (must match bit-for-bit up to float error, or WER parity dies):
  * sample rate 16000, n_fft 400, hop 160, 80/128 mel bins
  * STFT: periodic Hann window, centered frames with reflect padding
  * magnitudes = |stft|^2 with the final frame dropped (3000 frames for 30 s)
  * mel: Slaney-normalized triangular filterbank (librosa ``mel(16000, 400)``)
  * log10(max(mel, 1e-10)), floored at (global max - 8), then (x + 4) / 4

Two implementations are provided:
  * ``log_mel_spectrogram``: jax.numpy, jit-compatible, runs on TPU. The STFT is
    expressed as a real FFT over framed windows; XLA lowers this to efficient
    batched FFT + one MXU matmul for the filterbank.
  * ``log_mel_spectrogram_np``: pure NumPy for host-side data workers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

# Hard constants of the Whisper audio contract.
SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480,000 samples in a 30-second chunk
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 frames in a mel spectrogram input

N_SAMPLES_PER_TOKEN = HOP_LENGTH * 2  # initial convolutions has stride 2
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 100 mel frames per second
TOKENS_PER_SECOND = SAMPLE_RATE // N_SAMPLES_PER_TOKEN  # 50 tokens per second


def _hz_to_mel_slaney(freq):
    """Slaney-style (htk=False) Hz -> mel, as used by librosa's default."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freq >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filters_np(n_mels: int = 80, sr: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, float32, shape (n_mels, n_fft//2 + 1).

    Numerically identical to ``librosa.filters.mel(sr=16000, n_fft=400, n_mels=n_mels)``,
    which is what whisper's ``mel_filters.npz`` asset was generated from.
    """
    fmax = sr / 2.0
    fft_freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)

    mel_pts = np.linspace(_hz_to_mel_slaney(0.0), _hz_to_mel_slaney(fmax), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)  # (n_mels + 2,)

    fdiff = np.diff(mel_f)
    ramps = mel_f.reshape(-1, 1) - fft_freqs.reshape(1, -1)  # (n_mels+2, n_freq)

    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: scale to be approximately constant energy per channel
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm.reshape(-1, 1)
    return weights.astype(np.float32)


def pad_or_trim(array, length: int = N_SAMPLES, *, axis: int = -1):
    """Pad (with zeros) or trim the audio/mel array to ``length`` along ``axis``.

    Mirrors whisper's ``audio.pad_or_trim`` used at
    ``/root/reference/scripts/training/train_timestamps.py:199-207`` and
    ``/root/reference/olmoasr/transcribe.py:295``. Works on NumPy and JAX arrays.
    """
    xp = jnp if isinstance(array, jax.Array) else np
    if array.shape[axis] > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        array = array[tuple(sl)]
    if array.shape[axis] < length:
        pad_widths = [(0, 0)] * array.ndim
        pad_widths[axis] = (0, length - array.shape[axis])
        array = xp.pad(array, pad_widths)
    return array


def _hann_window_np(n: int = N_FFT) -> np.ndarray:
    # Periodic Hann (torch.hann_window default), not symmetric.
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def _reflect_pad_np(x: np.ndarray, pad: int) -> np.ndarray:
    return np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def log_mel_spectrogram_np(
    audio: np.ndarray,
    n_mels: int = 80,
    padding: int = 0,
) -> np.ndarray:
    """Pure-NumPy log-mel for host-side data workers. Shape (n_mels, n_frames)."""
    audio = np.asarray(audio, dtype=np.float32)
    squeeze = audio.ndim == 1
    audio = np.atleast_2d(audio)
    if padding > 0:
        audio = np.pad(audio, [(0, 0), (0, padding)])

    window = _hann_window_np(N_FFT)
    padded = _reflect_pad_np(audio, N_FFT // 2)
    n_frames_total = 1 + (padded.shape[-1] - N_FFT) // HOP_LENGTH
    idx = np.arange(N_FFT)[None, :] + HOP_LENGTH * np.arange(n_frames_total)[:, None]
    frames = padded[..., idx] * window  # (B, T, N_FFT)
    stft = np.fft.rfft(frames, axis=-1)  # (B, T, N_FFT//2+1)
    magnitudes = np.abs(stft[..., :-1, :]) ** 2  # drop last frame (torch.stft parity)

    filters = mel_filters_np(n_mels)
    mel_spec = magnitudes @ filters.T  # (B, T-1, n_mels)
    mel_spec = mel_spec.transpose(0, 2, 1)  # (B, n_mels, T-1)

    log_spec = np.log10(np.maximum(mel_spec, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max(axis=(-2, -1), keepdims=True) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    out = log_spec.astype(np.float32)
    return out[0] if squeeze else out


@functools.lru_cache(maxsize=2)
def _rdft_matrices_np(n: int = N_FFT) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT (n, n//2+1) cos/sin matrices: rfft(x) = x@C - i·(x@S).

    Computed in float64 then cast — the f32 matmul against these matches
    np.fft.rfft to ~1e-5 relative."""
    t = np.arange(n)[:, None].astype(np.float64)
    k = np.arange(n // 2 + 1)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * t * k / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mels", "padding", "use_fft"))
def _log_mel_jax(
    audio: jax.Array, n_mels: int, padding: int, use_fft: bool = False
) -> jax.Array:
    if audio.dtype == jnp.int16:
        # PCM-16 transport: callers upload int16 (half the bytes — the
        # host->device link is the long-form bottleneck on a remote chip)
        # and the exact /32768 rescale happens here on device.
        audio = audio.astype(jnp.float32) / 32768.0
    if padding > 0:
        audio = jnp.pad(audio, [(0, 0), (0, padding)])
    padded = jnp.pad(audio, [(0, 0), (N_FFT // 2, N_FFT // 2)], mode="reflect")
    if use_fft:
        window = jnp.asarray(_hann_window_np(N_FFT))
        n_frames_total = 1 + (padded.shape[-1] - N_FFT) // HOP_LENGTH
        starts = HOP_LENGTH * jnp.arange(n_frames_total)
        idx = starts[:, None] + jnp.arange(N_FFT)[None, :]
        frames = padded[:, idx] * window  # (B, T, N_FFT)
        stft = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
        magnitudes = jnp.abs(stft[:, :-1, :]) ** 2  # (B, T-1, n_fft//2+1)
        magnitudes = magnitudes.transpose(0, 2, 1)  # (B, F, T-1)
    else:
        # The framed-gather + FFT formulation is pathological on TPU: the
        # overlapping-window gather materializes (B, T, 400) through a
        # scatter-gather and XLA's 400-point FFT is far off speed-of-light —
        # measured ~9s for 64x150s of audio, serializing batched long-form.
        # Expressed instead as ONE strided f32 convolution (N_FFT-tap kernels
        # = windowed cos/sin DFT bases, stride=hop), the same STFT runs on
        # the MXU in milliseconds and matches np.fft.rfft to ~1e-5 relative.
        kernel, _ = _stft_kernel_np(n_mels)  # (402, 400)
        out = jax.lax.conv_general_dilated(
            padded[:, None, :].astype(jnp.float32),  # (B, 1, L)
            jnp.asarray(kernel[:, None, :]),  # (O=402, I=1, W=400)
            window_strides=(HOP_LENGTH,),
            padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )  # (B, 402, T)
        out = out[:, :, :-1]  # drop last frame (torch.stft parity)
        nf = N_FFT // 2 + 1
        re, im = out[:, :nf, :], out[:, nf:, :]
        magnitudes = re * re + im * im  # (B, F, T-1)

    filters = jnp.asarray(mel_filters_np(n_mels))
    mel_spec = jnp.einsum("bft,mf->bmt", magnitudes, filters)

    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0
    )
    return ((log_spec + 4.0) / 4.0).astype(jnp.float32)


@functools.lru_cache(maxsize=2)
def _stft_kernel_np(n_mels: int) -> Tuple[np.ndarray, np.ndarray]:
    """Shared STFT conv kernel + mel filterbank (see ``_log_mel_jax``)."""
    cos_m, sin_m = _rdft_matrices_np(N_FFT)
    window = _hann_window_np(N_FFT)
    kernel = np.concatenate([cos_m.T, sin_m.T], axis=0) * window[None, :]
    return kernel, mel_filters_np(n_mels)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def log_mel_chunk_unnorm(
    chunk: jax.Array, n_mels: int = 80
) -> Tuple[jax.Array, jax.Array]:
    """UNNORMALIZED log-mel of a self-contained streaming chunk.

    ``chunk``: (B, L) samples (int16 PCM or f32) where frame t of the output
    reads ``chunk[:, t*HOP : t*HOP + N_FFT]`` — the caller supplies the
    reflect head / halo / zero tail explicitly, so consecutive chunks of the
    padded stream produce bit-identical frames to one whole-row
    ``log_mel_spectrogram`` call (same conv kernel, same per-frame dots).
    Emits ``(L - (N_FFT - HOP)) // HOP`` frames (no torch drop-last here —
    the caller sizes chunks so the dropped global frame is never requested).

    Returns ``(log_spec (B, n_mels, F), rowmax (B,))`` where ``log_spec`` is
    pre-clamp (``log10(max(mel, 1e-10))``) — the whole-file normalization
    ``(max(x, filemax - 8) + 4) / 4`` is applied later at window-gather time
    by ``transcribe._gather_windows_norm`` once the file maximum is known.
    Used by ``transcribe.transcribe_many`` to overlap the PCM upload with
    decode (the reference uploads nothing — its mel is host-side torch,
    ``[pip:whisper] audio.log_mel_spectrogram``; on a remote-chip deployment
    the upload is the long-form wall and must stream behind the decode).
    """
    if chunk.dtype == jnp.int16:
        chunk = chunk.astype(jnp.float32) / 32768.0
    kernel, filters = _stft_kernel_np(n_mels)
    out = jax.lax.conv_general_dilated(
        chunk[:, None, :].astype(jnp.float32),
        jnp.asarray(kernel[:, None, :]),
        window_strides=(HOP_LENGTH,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, 402, F)
    nf = N_FFT // 2 + 1
    re, im = out[:, :nf, :], out[:, nf:, :]
    magnitudes = re * re + im * im
    mel_spec = jnp.einsum("bft,mf->bmt", magnitudes, jnp.asarray(filters))
    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    return log_spec, jnp.max(log_spec, axis=(-2, -1))


def log_mel_spectrogram(
    audio: Union[str, np.ndarray, jax.Array],
    n_mels: int = 80,
    padding: int = 0,
) -> jax.Array:
    """Log-mel spectrogram on device. Accepts a path, 1-D waveform, or (B, T) batch.

    Returns (n_mels, n_frames) for 1-D input, (B, n_mels, n_frames) for batched.
    Matches whisper's ``audio.log_mel_spectrogram`` (see module docstring).
    """
    if isinstance(audio, str):
        audio = load_audio(audio)
    is_i16 = getattr(audio, "dtype", None) == np.int16 or (
        hasattr(audio, "dtype") and audio.dtype == jnp.int16
    )
    audio = jnp.asarray(audio, dtype=jnp.int16 if is_i16 else jnp.float32)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    out = _log_mel_jax(audio, n_mels, padding)
    return out[0] if squeeze else out


def load_audio(path: str, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Load an audio file as float32 mono PCM at ``sr``.

    The reference shells out to ffmpeg (``[pip:whisper] audio.load_audio``); here we
    decode WAV/NumPy natively and fall back to the ffmpeg CLI for other containers
    when available.
    """
    if path.endswith(".npy"):
        arr = np.load(path)
        if arr.dtype == np.int16:
            return arr.astype(np.float32) / 32768.0
        return arr.astype(np.float32)
    if path.endswith(".wav"):
        import scipy.io.wavfile as wavfile

        rate, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim == 2:
            data = data.mean(axis=1)
        if rate != sr:
            data = resample_poly(data, sr, rate)
        return data
    return _load_audio_ffmpeg(path, sr)


def resample_poly(x: np.ndarray, target_sr: int, source_sr: int) -> np.ndarray:
    """Polyphase resampling via scipy (host-side)."""
    from math import gcd

    from scipy.signal import resample_poly as _rp

    g = gcd(target_sr, source_sr)
    return _rp(x, target_sr // g, source_sr // g).astype(np.float32)


def _load_audio_ffmpeg(path: str, sr: int) -> np.ndarray:
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            f"cannot decode {path!r}: ffmpeg not available and file is not wav/npy"
        )
    cmd = [
        "ffmpeg", "-nostdin", "-threads", "0", "-i", path,
        "-f", "s16le", "-ac", "1", "-acodec", "pcm_s16le", "-ar", str(sr), "-",
    ]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    return np.frombuffer(out, np.int16).flatten().astype(np.float32) / 32768.0
