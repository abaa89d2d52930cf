"""Normalizer tests: representative cases matching whisper's documented behavior
(the reference relies on EnglishTextNormalizer for every WER number)."""

import pytest

from olmoasr_tpu.normalizers import (
    BasicTextNormalizer,
    EnglishNumberNormalizer,
    EnglishTextNormalizer,
)


@pytest.mark.parametrize("std", [EnglishNumberNormalizer()])
def test_number_normalizer(std):
    assert std("two") == "2"
    assert std("thirty one") == "31"
    assert std("five twenty four") == "524"
    assert std("nineteen ninety nine") == "1999"
    assert std("twenty nineteen") == "2019"
    assert std("two point five million") == "2500000"
    assert std("four point two billions") == "4200000000s"
    assert std("200 thousand") == "200000"
    assert std("200 thousand dollars") == "$200000"
    assert std("$20 million") == "$20000000"
    assert std("€52.4 million") == "€52400000"
    assert std("£77 thousands") == "£77000s"
    assert std("two double o eight") == "2008"
    assert std("three thousand twenty nine") == "3029"
    assert std("forty three thousand two hundred sixty") == "43260"
    assert std("forty three thousand two hundred and sixty") == "43260"
    assert std("nineteen fifties") == "1950s"
    assert std("thirty one million people") == "31000000 people"
    assert std("twenty percent") == "20%"
    assert std("four point five") == "4.5"
    assert std("fifty one point five") == "51.5"
    assert std("point five") == ".5"
    assert std("point one two") == ".12"
    assert std("one dollar") == "$1"
    assert std("two dollars and fifty cents") == "$2.50"
    assert std("3.14") == "3.14"
    assert std("one hundred") == "100"
    assert std("one hundred and one") == "101"
    assert std("first") == "1st"
    assert std("second") == "2nd"
    assert std("third") == "3rd"
    assert std("twenty second") == "22nd"
    assert std("thirty first") == "31st"
    assert std("minus five hundred") == "-500"
    assert std("one million") == "1000000"


def test_english_text_normalizer_contractions():
    std = EnglishTextNormalizer()
    assert std("Let's") == "let us"
    assert std("he's like") == "he is like"
    assert std("she's been like") == "she has been like"
    assert std("Mr. Park visited Assoc. Prof. Kim Jr.") == (
        "mister park visited associate professor kim junior"
    )
    assert std("I won't do it") == "i will not do it"
    assert std("they're going") == "they are going"


def test_english_text_normalizer_cleanup():
    std = EnglishTextNormalizer()
    assert std("[inaudible] hello (noise) world") == "hello world"
    assert std("um hello uh world") == "hello world"
    assert std("hello,   world!") == "hello world"
    assert std("10,000 people") == "10000 people"


def test_spelling_normalizer():
    std = EnglishTextNormalizer()
    assert std("colour") == "color"
    assert std("organise the centre") == "organize the center"
    assert std("apologise") == "apologize"
    assert std("travelling theatre") == "traveling theater"


def test_basic_normalizer():
    std = BasicTextNormalizer()
    assert std("Hello, World!") == "hello world"
    assert std("[tag] Keep (drop) this") == "keep this"
