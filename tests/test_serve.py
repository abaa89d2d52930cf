"""Serving-layer tests: dynamic batching service + HTTP front end (CPU,
micro model)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from olmoasr_tpu.api import OLMoASR
from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.serve import BatchingService, serve

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51864, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


@pytest.fixture(scope="module")
def model():
    return OLMoASR(DIMS, inference=True)


def _tone(seconds=2.0, hz=440.0):
    t = np.arange(int(16000 * seconds)) / 16000.0
    return (0.2 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


OPTS = dict(
    temperature=0.0, compression_ratio_threshold=None, logprob_threshold=None,
    no_speech_threshold=None, without_timestamps=True, fp16=False,
)


def test_batching_service_matches_direct(model):
    from olmoasr_tpu.transcribe import transcribe_many

    wavs = [_tone(2.0, 300.0 + 100 * i) for i in range(4)]
    direct = transcribe_many(model, wavs, batch_size=4, verbose=None, **OPTS)
    with BatchingService(model, max_batch=4, max_wait_ms=200) as svc:
        futs = [svc.submit(w, **OPTS) for w in wavs]
        results = [f.result(timeout=300) for f in futs]
    for got, want in zip(results, direct):
        assert got["text"] == want["text"]
        assert got["language"] == want["language"]
    # the four jobs ran as one dynamic batch (same options signature)
    assert svc.stats["batches"] >= 1
    assert svc.stats["batched_jobs"] == 4


def test_batching_service_groups_by_options(model):
    wavs = [_tone(1.0), _tone(1.0)]
    with BatchingService(model, max_batch=8, max_wait_ms=200) as svc:
        f1 = svc.submit(wavs[0], **OPTS)
        f2 = svc.submit(wavs[1], **{**OPTS, "temperature": 0.5})
        r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
    assert isinstance(r1["text"], str) and isinstance(r2["text"], str)
    assert svc.stats["batches"] >= 2  # different options cannot share a batch


def test_submit_rejects_unknown_options(model):
    svc = BatchingService(model)
    with pytest.raises(ValueError, match="unknown decode options"):
        svc.submit(_tone(0.5), not_an_option=1)


def test_stop_rejects_submit_and_fails_queued(model):
    # after stop(): submit() raises instead of enqueueing into a dead worker,
    # and any job left in the queue gets its Future failed (never hangs)
    svc = BatchingService(model, max_batch=2, max_wait_ms=10)
    svc.stop()  # never started: stop must still close the service
    with pytest.raises(RuntimeError, match="stopped"):
        svc.submit(_tone(0.5), **OPTS)

    svc2 = BatchingService(model, max_batch=2, max_wait_ms=10)
    # enqueue directly behind a sentinel to simulate a job racing stop()
    from concurrent.futures import Future

    from olmoasr_tpu.serve import _SENTINEL

    fut = Future()
    svc2._queue.put(_SENTINEL)
    svc2._queue.put((_tone(0.5), dict(OPTS), fut))
    svc2.start()
    svc2.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        fut.result(timeout=30)


def test_http_server_end_to_end(model, tmp_path):
    import scipy.io.wavfile as wavfile

    wav = _tone(1.5)
    path = tmp_path / "tone.wav"
    wavfile.write(path, 16000, (wav * 32767).astype(np.int16))

    svc = BatchingService(model, max_batch=4, max_wait_ms=50,
                          default_options=dict(OPTS))
    server = serve(svc, host="127.0.0.1", port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["ok"] is True

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe?without_timestamps=true",
            data=path.read_bytes(), method="POST",
            headers={"X-Filename": "tone.wav"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert set(out) >= {"text", "segments", "language"}

        # unknown option -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe?bogus=1",
            data=b"x", method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        svc.stop()
