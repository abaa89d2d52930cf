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


@pytest.fixture(scope="module")
def unicode_rank_file(tmp_path_factory):
    """Rank file with multi-byte UTF-8 merges (accents, CJK, emoji pieces)."""
    import base64

    path = tmp_path_factory.mktemp("ranks") / "unicode.tiktoken"
    entries = [(bytes([b]), b) for b in range(256)]
    extra = [b" h", b"el", b"lo", "é".encode(), b" caf",
             " café".encode(), "日".encode(), "本".encode(),
             "日本".encode(), "\U0001f44d".encode()[:2],
             "\U0001f44d".encode()]
    entries += [(t, 256 + i) for i, t in enumerate(extra)]
    with open(path, "wb") as f:
        for tok, rank in entries:
            f.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")
    return str(path)


def test_native_matches_python_on_unicode(unicode_rank_file):
    """Full-unicode agreement (VERDICT r1): the C++ pre-tokenizer classifies
    decoded codepoints against tables generated from the Python `regex`
    module, so \\p{L}/\\p{N}/\\s splits match exactly."""
    ranks = pytok.load_tiktoken_ranks(unicode_rank_file)
    py_enc = pytok.BytePairEncoder(ranks, {})
    c_enc = native.NativeBPE(unicode_rank_file)
    for text in [
        " café hello", "日本 hello 日本語",
        "emoji \U0001f44d test", "mixed１２３digits",
        "non breaking space", "tabs\t\tand  spaces",
        "číslo ٣٤٥", "Ωμέγα",
        "a  b", "ideographic　space", "«quotes»—dash…",
        "", " ", "\t", "ß sharp",
        "ｆｕｌｌ", "I'll we've don't ’smart’",
    ]:
        assert c_enc.encode(text) == py_enc.encode(text), repr(text)


def test_native_matches_python_fuzz(unicode_rank_file):
    """Randomized unicode fuzz: mixed scripts, spaces, digits, symbols."""
    import random

    rng = random.Random(42)
    pools = [
        "abcdefghij ", "\t\n  　", "0123456789٠١٢",
        "àéîöüß", "日本語中文",
        "!?.,;:—…«»", "\U0001f600\U0001f44d\U0001f680",
        "'s't're've'm'll'd'",
    ]
    ranks = pytok.load_tiktoken_ranks(unicode_rank_file)
    py_enc = pytok.BytePairEncoder(ranks, {})
    c_enc = native.NativeBPE(unicode_rank_file)
    for _ in range(200):
        n = rng.randrange(0, 40)
        text = "".join(rng.choice(rng.choice(pools)) for _ in range(n))
        assert c_enc.encode(text) == py_enc.encode(text), repr(text)
