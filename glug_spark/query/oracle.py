"""DuckDB oracle SQL for arbitrary composed glug-dialect queries.

Generalizes the scored-terms + group/negation/phrase filter shape of
the full-scan executor (query.execute.search) into generated ANSI SQL,
so ANY parsed :class:`~glug_spark.query.parser.QueryPlan` — including
each slice of a batched ``Searcher.search_many`` call — has a
mechanical oracle twin. Arithmetic mirrors query.bm25's plans
token-for-token (same BM25 form, same rounding, same tiebreak).
"""

from __future__ import annotations

from glug_spark.index.build import B, K1
from glug_spark.query.parser import QueryPlan, parse_query
from glug_spark.semantics.glob import to_regex

_TOKS = """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[\\p{L}\\p{N}_]+')) AS BIGINT) AS dl,
           unnest(regexp_extract_all(text, '[\\p{L}\\p{N}_]+')) AS term,
           generate_subscripts(regexp_extract_all(text, '[\\p{L}\\p{N}_]+'), 1) - 1 AS pos
    FROM documents
"""

_COLL = """
    SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
    FROM (SELECT doc_id, CAST(len(regexp_extract_all(text, '[\\p{L}\\p{N}_]+')) AS BIGINT) AS dl
          FROM documents)
"""


def _quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _member_pred(members: list[tuple[str, str]]) -> str:
    """term-column predicate: matches any member (term IN / glob regex)."""
    terms = [v for kind, v in members if kind == "term"]
    parts = []
    if terms:
        parts.append(f"term IN ({', '.join(_quote(t) for t in terms)})")
    for kind, v in members:
        if kind == "glob":
            parts.append(
                f"regexp_full_match(term, {_quote(to_regex(v))})"
            )
    return "(" + " OR ".join(parts) + ")" if parts else "FALSE"


def _phrase_cte(name: str, words: list[str]) -> str:
    joins, conds = [], [f"t0.term = {_quote(words[0])}"]
    for i, w in enumerate(words[1:], start=1):
        joins.append(
            f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
        )
        conds.append(f"t{i}.term = {_quote(w)}")
    return (
        f"{name} AS (SELECT DISTINCT t0.doc_id FROM toks t0 "
        f"{' '.join(joins)} WHERE {' AND '.join(conds)})"
    )


def _near_cte(name: str, a: str, b: str, slop: int, ordered: bool) -> str:
    gap = "(t1.pos - t0.pos)" if ordered else "abs(t1.pos - t0.pos)"
    return (
        f"{name} AS (SELECT DISTINCT t0.doc_id FROM toks t0 "
        f"JOIN toks t1 ON t1.doc_id = t0.doc_id "
        f"WHERE t0.term = {_quote(a)} AND t1.term = {_quote(b)} "
        f"AND {gap} BETWEEN 1 AND {int(slop)})"
    )


def composed_oracle_sql(query: str | QueryPlan, k: int = 10) -> str:
    """Oracle for one composed query: (rank, doc_id, score) top-k."""
    plan = parse_query(query) if isinstance(query, str) else query
    phrase_words = [w for ph in plan.phrases for w in ph]
    all_positive = [m for g in plan.groups for m in g] + [
        ("term", w) for w in phrase_words
    ] + [("term", w) for w in plan.near_words]
    if not all_positive:
        raise ValueError("composed query has no positive constraint")

    ctes = [
        f"toks AS ({_TOKS})",
        f"qtoks AS (SELECT * FROM toks WHERE {_member_pred(all_positive)})",
        "postings AS (SELECT term, doc_id, count(*) AS tf, max(dl) AS dl"
        " FROM qtoks GROUP BY term, doc_id)",
        "stats AS (SELECT term, count(*) AS df FROM postings GROUP BY term)",
        f"coll AS ({_COLL})",
    ]
    filters = []
    for i, grp in enumerate(plan.groups):
        ctes.append(
            f"grp{i} AS (SELECT DISTINCT doc_id FROM toks"
            f" WHERE {_member_pred(grp)})"
        )
        filters.append(f"p.doc_id IN (SELECT doc_id FROM grp{i})")
    if plan.negations:
        ctes.append(
            "neg AS (SELECT DISTINCT doc_id FROM toks"
            f" WHERE {_member_pred(plan.negations)})"
        )
        filters.append("p.doc_id NOT IN (SELECT doc_id FROM neg)")
    for j, ph in enumerate(plan.phrases):
        ctes.append(_phrase_cte(f"ph{j}", ph))
        filters.append(f"p.doc_id IN (SELECT doc_id FROM ph{j})")
    for j, (a, b, slop, ordered) in enumerate(plan.nears):
        ctes.append(_near_cte(f"nr{j}", a, b, slop, ordered))
        filters.append(f"p.doc_id IN (SELECT doc_id FROM nr{j})")
    where = ("WHERE " + " AND ".join(filters)) if filters else ""

    ctes.append(f"""per_doc AS (
    SELECT p.doc_id,
           sum( ln(1.0 + (c.n_docs - s.df + 0.5) / (s.df + 0.5))
                * (p.tf * ({K1} + 1.0))
                / (p.tf + {K1} * (1.0 - {B} + {B} * p.dl / c.avgdl)) ) AS raw_score
    FROM postings p JOIN stats s USING (term) CROSS JOIN coll c
    {where}
    GROUP BY p.doc_id
)""")
    ctes.append(
        f"topk AS (SELECT doc_id, raw_score FROM per_doc"
        f" ORDER BY raw_score DESC, doc_id ASC LIMIT {k})"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT CAST(row_number() OVER (ORDER BY raw_score DESC, doc_id ASC) AS INT) AS rank,\n"
        "       doc_id, round(raw_score, 6) AS score\nFROM topk"
    )


def batched_oracle_sql(per_query_sql: dict[str, str]) -> str:
    """UNION ALL of per-query oracles tagged with query_id — the twin of
    ``Searcher.topk_many`` / ``Searcher.search_many`` output."""
    return "\nUNION ALL\n".join(
        f"SELECT {_quote(qid)} AS query_id, * FROM ({sql})"
        for qid, sql in per_query_sql.items()
    )
