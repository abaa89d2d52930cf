"""C++ BPE core vs the Python reference engine: identical ids on English text."""

import os

import pytest

from olmoasr_tpu import tokenizer as pytok

native = pytest.importorskip("olmoasr_tpu.tokenizer_native")
if not native.native_available():
    pytest.skip("g++ not available", allow_module_level=True)


@pytest.fixture(scope="module")
def rank_file(tmp_path_factory):
    """Synthetic tiktoken-format rank file with bytes + a few merges."""
    import base64

    path = tmp_path_factory.mktemp("ranks") / "test.tiktoken"
    entries = [(bytes([b]), b) for b in range(256)]
    entries += [(b" h", 256), (b"el", 257), (b"lo", 258), (b" he", 259),
                (b" hel", 260), (b" hell", 261), (b" hello", 262), (b"ll", 263)]
    with open(path, "wb") as f:
        for tok, rank in entries:
            f.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")
    return str(path)


def test_native_matches_python_engine(rank_file):
    ranks = pytok.load_tiktoken_ranks(rank_file)
    py_enc = pytok.BytePairEncoder(ranks, {})
    c_enc = native.NativeBPE(rank_file)
    assert c_enc.n_vocab == len(ranks)
    for text in [
        " hello world", "hello", "  double  spaces ", "it's a test",
        "numbers 12345 mixed", "punct!?.,;", " hello hello hello",
        "", " ", "a", "I'll we've don't",
    ]:
        assert c_enc.encode(text) == py_enc.encode(text), repr(text)


def test_native_byte_fallback_roundtrip():
    enc = native.NativeBPE(None)
    ids = enc.encode("hello world")
    assert ids == list(b"hello world")


def test_native_throughput_sanity(rank_file):
    """The native path should beat pure Python comfortably."""
    import time

    ranks = pytok.load_tiktoken_ranks(rank_file)
    py_enc = pytok.BytePairEncoder(ranks, {})
    c_enc = native.NativeBPE(rank_file)
    text = " the quick brown fox jumps over the lazy dog" * 50

    t0 = time.perf_counter()
    for _ in range(50):
        c_enc.encode(text)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(50):
        py_enc.encode(text)
    t_py = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)
