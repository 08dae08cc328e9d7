"""Tokenizer dialect parity on adversarial unicode: the THREE engines
that tokenize (Python `\\w+` in the build encoder, Java
`[\\p{L}\\p{N}_]+` in the full-scan plans, RE2-style in the DuckDB
oracle) must produce identical token streams, or index-path and
full-scan rank-identity silently breaks on non-ASCII webtext."""

from __future__ import annotations

import pytest

from glug_spark.semantics.tokenize import TOKEN_PATTERN, tokenize

TRICKY = [
    "plain ascii text_with_underscore x9",
    "Ελληνική ελληνικά UPPER lower ΜΙΞΗ",
    "українська мова і текст",
    "한국어 텍스트 조각",
    "日本語テキストの断片",
    "mixed ascii και ελληνικά and 한국어",
    "digits ١٢٣ devanagari १२३ fullwidth １２３",
    "roman Ⅻ circled ① fraction ¼ superscript ²",
    "é combining-acute vs precomposed é",
    "snake_case camelCase SCREAMING_SNAKE dot.sep dash-sep",
    "tab\tand\nnewline  multiple   spaces",
    "emoji 🎉 mixed🎉inside and zwj 👩‍💻 seq",
    "中文文本片段 简体 繁體",
    "ÅåÄäÖö ß ẞ ﬁ ligature",
]


@pytest.mark.parametrize("text", TRICKY)
def test_python_vs_duckdb_tokens(duck, text):
    got_py = tokenize(text)
    got_duck = [
        r[0]
        for r in duck.execute(
            "SELECT unnest(regexp_extract_all(?, ?))", [text, TOKEN_PATTERN]
        ).fetchall()
    ]
    assert got_py == got_duck, text


def test_python_vs_jvm_tokens(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TRICKY)],
                               "doc_id long, text string")
    rows = df.select(
        "doc_id",
        F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), F.lit(0)
                             ).alias("toks"),
    ).collect()
    jvm = {r["doc_id"]: list(r["toks"]) for r in rows}
    for i, text in enumerate(TRICKY):
        assert tokenize(text) == jvm[i], text
