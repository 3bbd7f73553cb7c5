"""Unicode normalization for text curation — NFC/NFKC canonicalization
(UAX #15), the step that precedes any exact or hashed dedup on real
multilingual corpora: visually identical strings with different
codepoint sequences ('e'+COMBINING ACUTE vs precomposed U+00E9,
ligature/fullwidth compatibility forms) otherwise hash apart and defeat
exact dedup, shingles, and vocab building.

Implementation is the stdlib ``unicodedata.normalize`` over
Arrow-batched pandas Series — per-row, shuffle-free, linear at any
scale. The oracle side uses DuckDB's ``nfc_normalize`` for NFC (engine
interop pins the two libraries agree on real sequences) and symbolic
expectations for NFKC (DuckDB ships no NFKC; the builder injects
compatibility forms whose NFKC image is known).

``build_denormalized`` is the builder-exercises-parser fixture: it
appends a doc_id-selected suffix drawing from the interesting
normalization classes — combining sequence (NFC composes), ligature
(NFKC expands, +1 char), fullwidth letters (NFKC folds, same length),
ANGSTROM SIGN (NFC maps to U+00C5), plain ASCII (fixpoint). Escape
sequences keep the denormalized codepoints explicit (an editor or
tool normalizing this source file must not silently change the
fixture).
"""

from __future__ import annotations

import unicodedata

#: doc_id % 5 → appended suffix. Keep in sync with the SQL CASE in
#: queries.py unicode_normalize_report (chr() codepoints there).
SUFFIXES = [
    "cafe\u0301",  # 0: e+COMBINING ACUTE -> NFC precomposes (-1 char)
    "\ufb01le",  # 1: fi ligature -> NFC stable, NFKC 'file' (+1 char)
    "\uff21\uff22",  # 2: fullwidth AB -> NFC stable, NFKC 'AB' (same len)
    "\u212bunit",  # 3: ANGSTROM SIGN -> NFC U+00C5 (same len)
    "ok",  # 4: ASCII fixpoint
]


def build_denormalized(text: str, doc_id: int) -> str:
    """Deterministically append a normalization-sensitive suffix."""
    return text + " " + SUFFIXES[doc_id % 5]


def normalize(text: str, form: str = "NFC") -> str:
    """``unicodedata.normalize`` with the usual forms (NFC/NFD/NFKC/NFKD)."""
    return unicodedata.normalize(form, text)
