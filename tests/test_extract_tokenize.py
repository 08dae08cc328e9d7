"""Byte-fidelity tests for the extractor and tokenizer kernels.

Invariants inherited from the reference: UTF-8 passthrough with NO
normalization, CRLF preserved, case-sensitive (case-mixed inputs stay
distinct — reference parity guards case-mixed names,
test/parity/repos.py:29-34).
"""

from __future__ import annotations

import pytest

from glug_spark.semantics.extract import extract_text, wrap_html
from glug_spark.semantics.tokenize import tokenize, tokenize_with_positions

ROUNDTRIP_CASES = [
    "plain ascii text",
    "line one\nline two\n",
    "crlf line\r\nnext\r\n",          # CRLF survives byte-identically
    "trailing spaces   \nand tab\t",
    "unicode: naïve café 北京 ελληνικά",
    "README readme ReadMe",           # case triplet stays distinct
    "<pre>nested markers</pre> inside",
    "",
]


@pytest.mark.parametrize("text", ROUNDTRIP_CASES)
def test_wrap_extract_roundtrip(text: str) -> None:
    html = wrap_html(text, url="https://h.example/a/b.html")
    assert extract_text(html) == text


def test_extract_no_markers() -> None:
    assert extract_text(b"<html><body>no pre</body></html>") == ""


TOKENIZE_CASES = [
    ("the fast key", ["the", "fast", "key"]),
    ("README readme", ["README", "readme"]),     # no case folding
    ("a_b c-d", ["a_b", "c", "d"]),              # _ in token, - is boundary
    ("x1 2y _z", ["x1", "2y", "_z"]),
    ("naïve café", ["naïve", "café"]),           # unicode letters
    ("北京 ok", ["北京", "ok"]),
    ("", []),
    ("  \r\n\t ", []),
    ("a..b", ["a", "b"]),
]


@pytest.mark.parametrize("text,expected", TOKENIZE_CASES)
def test_tokenize(text: str, expected: list[str]) -> None:
    assert tokenize(text) == expected


def test_positions_are_token_indices() -> None:
    assert tokenize_with_positions("a b a") == [(0, "a"), (1, "b"), (2, "a")]


def test_spark_tokenizer_agrees_with_kernel(spark) -> None:
    """The JVM-side regexp tokenizer and the Python kernel must agree on
    the corpus vocabulary class (same \\p{L}\\p{N}_ token definition)."""
    from glug_spark.index.build import token_array

    samples = [c[0] for c in TOKENIZE_CASES]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    rows = df.select("text", token_array("text").alias("toks")).collect()
    for row in rows:
        assert list(row["toks"]) == tokenize(row["text"]), row["text"]
