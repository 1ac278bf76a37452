"""Text cleaners.

Behavioral equivalent of the reference pipeline
(reference: DEX-TTS/text/cleaners.py:38-73): ASCII folding → lowercase →
number expansion → abbreviation expansion → whitespace collapse.
ASCII folding uses NFKD decomposition + combining-mark stripping instead of
`unidecode` (not in the runtime image); for Latin-script text with
diacritics this matches unidecode's output.
"""

from __future__ import annotations

import re
import unicodedata

from dex_tts_tpu.text.numbers import normalize_numbers

_whitespace_re = re.compile(r"\s+")

_abbreviations = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), expansion)
    for abbr, expansion in [
        ("mrs", "misess"),
        ("mr", "mister"),
        ("dr", "doctor"),
        ("st", "saint"),
        ("co", "company"),
        ("jr", "junior"),
        ("maj", "major"),
        ("gen", "general"),
        ("drs", "doctors"),
        ("rev", "reverend"),
        ("lt", "lieutenant"),
        ("hon", "honorable"),
        ("sgt", "sergeant"),
        ("capt", "captain"),
        ("esq", "esquire"),
        ("ltd", "limited"),
        ("col", "colonel"),
        ("ft", "fort"),
    ]
]

# A few common non-decomposable Latin letters NFKD leaves untouched.
_ASCII_FALLBACK = str.maketrans(
    {
        "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
        "ø": "o", "Ø": "O", "ß": "ss", "ð": "d", "Ð": "D",
        "þ": "th", "Þ": "Th", "đ": "d", "Đ": "D",
        "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
        "’": "'", "‘": "'", "“": '"', "”": '"', "—": "-", "–": "-",
    }
)


def convert_to_ascii(text: str) -> str:
    text = text.translate(_ASCII_FALLBACK)
    decomposed = unicodedata.normalize("NFKD", text)
    return decomposed.encode("ascii", "ignore").decode("ascii")


def lowercase(text: str) -> str:
    return text.lower()


def expand_numbers(text: str) -> str:
    return normalize_numbers(text)


def expand_abbreviations(text: str) -> str:
    for regex, replacement in _abbreviations:
        text = re.sub(regex, replacement, text)
    return text


def collapse_whitespace(text: str) -> str:
    return re.sub(_whitespace_re, " ", text)


def basic_cleaners(text: str) -> str:
    return collapse_whitespace(lowercase(text))


def transliteration_cleaners(text: str) -> str:
    return collapse_whitespace(lowercase(convert_to_ascii(text)))


def english_cleaners(text: str) -> str:
    text = convert_to_ascii(text)
    text = lowercase(text)
    text = expand_numbers(text)
    text = expand_abbreviations(text)
    text = collapse_whitespace(text)
    return text
