"""WER tests against hand-computed Levenshtein cases."""

import pytest

from olmoasr_tpu.eval.wer import calculate_wer, compute_measures, wer


def test_perfect():
    m = compute_measures("hello world", "hello world")
    assert m.wer == 0.0
    assert m.hits == 2


def test_substitution():
    m = compute_measures("hello world", "hello word")
    assert m.wer == pytest.approx(0.5)
    assert m.substitutions == 1


def test_insertion_deletion():
    assert compute_measures("a b c", "a b c d").insertions == 1
    assert compute_measures("a b c", "a c").deletions == 1
    assert wer("a b c", "a c") == pytest.approx(1 / 3)


def test_empty_cases():
    assert compute_measures("", "").wer == 0.0
    m = compute_measures("", "spurious words")
    assert m.insertions == 2
    m = compute_measures("two words", "")
    assert m.wer == 1.0
    assert m.deletions == 2


def test_corpus_aggregation():
    # corpus-level: sum of edits over sum of ref lengths (jiwer semantics)
    m = compute_measures(["a b", "c d e f"], ["a x", "c d e f"])
    assert m.wer == pytest.approx(1 / 6)


def test_calculate_wer_pairs():
    assert calculate_wer([("a b", "a b"), ("c", "d")]) == pytest.approx(1 / 3)
    assert calculate_wer([]) == 0.0


def test_known_alignment():
    # classic: ref "the quick brown fox", hyp "quick brown fax jumps"
    m = compute_measures("the quick brown fox", "quick brown fax jumps")
    assert m.deletions == 1  # "the"
    assert m.substitutions == 1  # fox->fax
    assert m.insertions == 1  # jumps
    assert m.wer == pytest.approx(3 / 4)
