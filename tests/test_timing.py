"""Word-timing tests: DTW, median filter, punctuation merging, and the
end-to-end word_timestamps path on a micro model."""

import numpy as np
import pytest

from olmoasr_tpu.timing import WordTiming, dtw, median_filter, merge_punctuations


def test_dtw_identity():
    # strong diagonal cost -> diagonal path
    N = 8
    x = np.ones((N, N)) - np.eye(N)
    ti, fi = dtw(x)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == N - 1 and fi[-1] == N - 1
    # monotonic
    assert np.all(np.diff(ti) >= 0) and np.all(np.diff(fi) >= 0)


def test_dtw_rectangular():
    x = np.random.default_rng(0).random((5, 20))
    ti, fi = dtw(x)
    assert ti[-1] == 4 and fi[-1] == 19


def test_median_filter():
    x = np.array([[1.0, 100.0, 1.0, 1.0, 1.0, 1.0, 100.0, 1.0]])
    out = median_filter(x, 3)
    assert out.shape == x.shape
    assert out[0, 1] == 1.0  # spike removed


def test_merge_punctuations():
    words = [
        WordTiming(" \"", [1], 0.0, 0.1, 0.9),
        WordTiming("Hello", [2], 0.1, 0.5, 0.9),
        WordTiming(",", [3], 0.5, 0.6, 0.9),
        WordTiming(" world", [4], 0.6, 1.0, 0.9),
    ]
    merge_punctuations(words, "\"'“¿([{-", "\"'.。,，!！?？:：”)]}、")
    texts = [w.word for w in words if w.word]
    assert texts == [" \"Hello,", " world"]


def test_add_word_timestamps_end_to_end():
    import jax
    from olmoasr_tpu.api import OLMoASR
    from olmoasr_tpu.models.dims import ModelDimensions
    from olmoasr_tpu.timing import add_word_timestamps
    from olmoasr_tpu.tokenizer import get_tokenizer

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
        n_audio_layer=1, n_vocab=51864, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    model = OLMoASR(dims, inference=True)
    tok = get_tokenizer(False)
    text_tokens = tok.encode(" hello world again")
    segments = [{
        "seek": 0, "start": 0.0, "end": 3.0,
        "tokens": [tok.timestamp_begin] + text_tokens + [tok.timestamp_begin + 150],
        "text": " hello world again",
    }]
    mel = jax.numpy.zeros((80, 3000))
    add_word_timestamps(
        segments=segments, model=model, tokenizer=tok, mel=mel,
        num_frames=300, last_speech_timestamp=0.0,
    )
    words = segments[0]["words"]
    assert len(words) == 3
    for w in words:
        assert 0.0 <= w["start"] <= w["end"]
        assert "probability" in w
