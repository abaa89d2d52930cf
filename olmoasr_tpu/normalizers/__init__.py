from olmoasr_tpu.normalizers.basic import (
    BasicTextNormalizer,
    remove_symbols,
    remove_symbols_and_diacritics,
)
from olmoasr_tpu.normalizers.english import (
    EnglishNumberNormalizer,
    EnglishSpellingNormalizer,
    EnglishTextNormalizer,
)

__all__ = [
    "BasicTextNormalizer",
    "EnglishNumberNormalizer",
    "EnglishSpellingNormalizer",
    "EnglishTextNormalizer",
    "remove_symbols",
    "remove_symbols_and_diacritics",
]
