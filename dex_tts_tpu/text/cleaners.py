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

# Non-decomposable letters NFKD leaves untouched, transliterated per
# unidecode's tables (the reference's ASCII folder — unidecode is not in
# the runtime image, so the tables are reproduced here for the scripts
# DEX-TTS users realistically feed: Latin extras, Cyrillic, Greek).
_LATIN = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "ß": "ss", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "Th", "đ": "d", "Đ": "D",
    "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ı": "i", "ĸ": "k", "ŋ": "ng", "Ŋ": "NG",
    "’": "'", "‘": "'", "“": '"', "”": '"', "—": "-", "–": "-",
}

# unidecode x004.py (Cyrillic). Lowercase; uppercase derived below with
# unidecode's capitalization (first letter only: Щ → Shch).
_CYRILLIC = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l",
    "м": "m", "н": "n", "о": "o", "п": "p", "р": "r", "с": "s",
    "т": "t", "у": "u", "ф": "f", "х": "kh", "ц": "ts", "ч": "ch",
    "ш": "sh", "щ": "shch", "ъ": "'", "ы": "y", "ь": "'", "э": "e",
    "ю": "yu", "я": "ya", "ё": "e",
    # Ukrainian / Belarusian extras
    "є": "ye", "і": "i", "ї": "yi", "ґ": "g", "ў": "u", "ђ": "dj",
    "ј": "j", "љ": "lj", "њ": "nj", "ћ": "c", "џ": "dz",
}

# unidecode x003.py (Greek)
_GREEK = {
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
    "η": "e", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
    "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "σ": "s",
    "ς": "s", "τ": "t", "υ": "u", "φ": "ph", "χ": "kh", "ψ": "ps",
    "ω": "o",
}


def _with_upper(table: dict) -> dict:
    out = dict(table)
    for ch, tr in table.items():
        up = ch.upper()
        if up != ch and up not in out:
            out[up] = tr[:1].upper() + tr[1:]
    return out


_ASCII_FALLBACK = str.maketrans(
    {**_LATIN, **_with_upper(_CYRILLIC), **_with_upper(_GREEK)}
)


def convert_to_ascii(text: str) -> str:
    # Translate precomposed table hits first (ї → yi, like unidecode's
    # direct mapping), then NFKD so accented letters the table doesn't
    # list decompose to a base letter, translate those, and drop the
    # combining marks / anything still non-ASCII like unidecode does.
    text = text.translate(_ASCII_FALLBACK)
    decomposed = unicodedata.normalize("NFKD", text)
    translated = decomposed.translate(_ASCII_FALLBACK)
    return translated.encode("ascii", "ignore").decode("ascii")


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
