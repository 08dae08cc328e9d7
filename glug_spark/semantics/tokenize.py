"""Canonical tokenizer — case-sensitive, byte-faithful, position-aware.

Inherits the reference's text invariants (case-sensitive byte-wise
matching, no case folding, no unicode normalization — reference
src/regex/*.cpp compile no case-insensitive flag anywhere, and unicode
inputs pass through untouched).

A token is a maximal run of Unicode letters/digits/underscore. The ONE
pattern below is expressed in three dialects that agree on this class:

- Spark (Java regex):   ``[\\p{L}\\p{N}_]+``
- DuckDB (RE2):         ``[\\p{L}\\p{N}_]+``
- Python ``re``:        ``\\w+`` (== L* ∪ N* ∪ {_} for our corpora)

Token *position* is the 0-based token index (not byte offset) — that is
what phrase adjacency needs.
"""

from __future__ import annotations

import re

#: The canonical pattern, in the Java/RE2 dialect (used verbatim by both
#: Spark ``regexp_extract_all`` and DuckDB oracle SQL).
TOKEN_PATTERN = r"[\p{L}\p{N}_]+"

_PY_TOKEN = re.compile(r"\w+", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """All tokens in order, case preserved."""
    return _PY_TOKEN.findall(text)


def tokenize_with_positions(text: str) -> list[tuple[int, str]]:
    """(token_index, term) pairs, 0-based."""
    return list(enumerate(_PY_TOKEN.findall(text)))
