"""Result snippets: a deterministic match window from the doc store.

The reference is a grep-style tool whose output is the matching *line*
(reference src/main.cpp:136-138 prints usable paths; grep semantics show
the matched text). The engine's index path returns (rank, doc_id,
score) — this module adds the text context a search user actually reads.

Snippet rule (deliberately closed-form so the DuckDB oracle can mirror
it bit-for-bit): the snippet is the ``SNIPPET_LEN``-char substring of
the document text starting ``SNIPPET_BEFORE`` chars before the EARLIEST
occurrence (1-based, case-sensitive — the tokenizer's byte-wise
invariant) of any query term, clamped to the start of the text; NULL
when no term occurs as a substring (possible for composed/glob queries
where the scored vocabulary is not the literal input).

Scale: snippets are computed on the k RESULT rows after the broadcast
join onto the doc_id-bucketed docmap/doc-store (query.searcher
``attach_urls``) — a pruned k-row lookup. The corpus is never scanned
and the text column is only read from the (at most k) pruned bucket
directories, never for url-only lookups (parquet column pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: chars of context kept before the first matched term
SNIPPET_BEFORE = 40
#: total snippet length in chars
SNIPPET_LEN = 120
#: sentinel for "term absent" — larger than any real 1-based position
_ABSENT = 2147483647


def _sql_quote(term: str) -> str:
    return "'" + term.replace("'", "''") + "'"


def first_match_col(terms: list[str], text: Column) -> Column:
    """1-based char position of the earliest occurrence of any term in
    ``text``; NULL when none occurs. ``locate`` is a literal substring
    search (no regex), matching DuckDB ``strpos``."""
    if not terms:
        return F.lit(None).cast("int")
    ranked = [
        F.when(F.locate(t, text) == 0, F.lit(_ABSENT))
        .otherwise(F.locate(t, text))
        for t in terms
    ]
    best = ranked[0] if len(ranked) == 1 else F.least(*ranked)
    return F.when(best == _ABSENT, F.lit(None).cast("int")).otherwise(
        best.cast("int")
    )


def snippet_col(terms: list[str], text: Column) -> Column:
    """The snippet window around the earliest query-term match."""
    first = first_match_col(terms, text)
    start = F.greatest(first - F.lit(SNIPPET_BEFORE), F.lit(1))
    return F.when(
        first.isNotNull(), F.substring(text, start, F.lit(SNIPPET_LEN))
    ).cast("string")


def first_match_sql(terms: list[str], text_expr: str) -> str:
    """DuckDB mirror of :func:`first_match_col`."""
    if not terms:
        return "CAST(NULL AS INT)"
    ranked = [
        f"(CASE WHEN strpos({text_expr}, {_sql_quote(t)}) = 0 "
        f"THEN {_ABSENT} ELSE strpos({text_expr}, {_sql_quote(t)}) END)"
        for t in terms
    ]
    best = ranked[0] if len(ranked) == 1 else f"least({', '.join(ranked)})"
    return (
        f"(CASE WHEN {best} = {_ABSENT} THEN CAST(NULL AS INT) "
        f"ELSE CAST({best} AS INT) END)"
    )


def snippet_sql(terms: list[str], text_expr: str) -> str:
    """DuckDB mirror of :func:`snippet_col`."""
    first = first_match_sql(terms, text_expr)
    return (
        f"(CASE WHEN {first} IS NOT NULL THEN "
        f"substring({text_expr}, "
        f"greatest({first} - {SNIPPET_BEFORE}, 1), {SNIPPET_LEN}) "
        f"ELSE CAST(NULL AS VARCHAR) END)"
    )
