"""Audio frontend tests: golden comparison against torch.stft mechanics
(the reference's mel pipeline is torch.stft + librosa filterbank; see
/root/reference SURVEY §1 layer 3) plus contract checks."""

import numpy as np
import pytest

from olmoasr_tpu import audio


def test_constants():
    assert audio.SAMPLE_RATE == 16000
    assert audio.N_FFT == 400
    assert audio.HOP_LENGTH == 160
    assert audio.N_SAMPLES == 480_000
    assert audio.N_FRAMES == 3000
    assert audio.FRAMES_PER_SECOND == 100


def test_mel_filterbank_shape_and_energy():
    f = audio.mel_filters_np(80)
    assert f.shape == (80, 201)
    assert f.dtype == np.float32
    # every filter has nonzero support, filters tile the band
    assert (f.sum(axis=1) > 0).all()
    # Slaney normalization: peak amplitudes decrease with bandwidth growth
    assert f.max() < 0.05


def test_pad_or_trim():
    x = np.ones(1000, np.float32)
    assert audio.pad_or_trim(x).shape == (480_000,)
    assert audio.pad_or_trim(np.ones(500_001, np.float32)).shape == (480_000,)
    m = np.ones((80, 3500), np.float32)
    assert audio.pad_or_trim(m, 3000).shape == (80, 3000)


def test_log_mel_matches_torch_stft_reference():
    """Cross-check our framing/FFT against torch.stft with whisper's settings."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1

    # torch reference path (what whisper's audio.log_mel_spectrogram does)
    t = torch.from_numpy(wav)
    window = torch.hann_window(400)
    stft = torch.stft(t, 400, 160, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2  # (201, T-1)
    filters = torch.from_numpy(audio.mel_filters_np(80))
    mel = filters @ magnitudes
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    golden = ((log_spec + 4.0) / 4.0).numpy()

    ours_np = audio.log_mel_spectrogram_np(wav)
    ours_jax = np.asarray(audio.log_mel_spectrogram(wav))

    # torch computes the FFT in float32; our numpy path upcasts to float64.
    # ~1e-3 in (x+4)/4 log10 space is far below anything WER-visible.
    assert ours_np.shape == golden.shape
    np.testing.assert_allclose(ours_np, golden, atol=2e-3)
    np.testing.assert_allclose(ours_jax, golden, atol=2e-3)


def test_log_mel_shapes_and_padding():
    wav = np.zeros(480_000, np.float32)
    m = audio.log_mel_spectrogram_np(wav)
    assert m.shape == (80, 3000)
    # with 30s padding appended (transcribe.py:148 contract)
    m2 = audio.log_mel_spectrogram_np(wav, padding=audio.N_SAMPLES)
    assert m2.shape == (80, 6000)
    # batched jax path
    mb = audio.log_mel_spectrogram(np.zeros((2, 480_000), np.float32))
    assert mb.shape == (2, 80, 3000)


def test_np_and_jax_agree():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(48000).astype(np.float32)
    a = audio.log_mel_spectrogram_np(wav)
    b = np.asarray(audio.log_mel_spectrogram(wav))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)


def test_dft_matmul_matches_fft():
    """The MXU DFT-matmul STFT (the TPU default — XLA's TPU FFT for
    400-point frames measured ~1000x off speed-of-light) == jnp.fft.rfft."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32))
    a = np.asarray(audio._log_mel_jax(wav, 80, 480000, use_fft=True))
    b = np.asarray(audio._log_mel_jax(wav, 80, 480000, use_fft=False))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3)


def test_load_audio_wav_formats(tmp_path):
    import scipy.io.wavfile as wavfile

    rng = np.random.default_rng(0)
    f32 = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    # int16 mono
    p = str(tmp_path / "i16.wav")
    wavfile.write(p, 16000, (f32 * 32767).astype(np.int16))
    out = audio.load_audio(p)
    assert out.dtype == np.float32 and len(out) == 16000
    np.testing.assert_allclose(out, f32, atol=2e-3)

    # stereo int16 -> mono mean
    p2 = str(tmp_path / "st.wav")
    wavfile.write(p2, 16000, np.stack([(f32 * 32767).astype(np.int16)] * 2, 1))
    out2 = audio.load_audio(p2)
    assert out2.ndim == 1

    # 8 kHz input -> resampled to 16 kHz
    p3 = str(tmp_path / "sr8.wav")
    wavfile.write(p3, 8000, (f32[:8000] * 32767).astype(np.int16))
    out3 = audio.load_audio(p3)
    assert len(out3) == 16000

    # npy int16 path (training data format)
    p4 = str(tmp_path / "a.npy")
    np.save(p4, (f32 * 32767).astype(np.int16))
    out4 = audio.load_audio(p4)
    np.testing.assert_allclose(out4, f32, atol=2e-3)
