"""query.oracle: the generated composed-query oracle must agree with the
handwritten search_mixed oracle and honor each filter role. Spark-free
(DuckDB only) — also exercised end-to-end by the driver scoreboard rows
searcher_search_many / searcher_topk_many."""

from __future__ import annotations

import duckdb
import pytest

from glug_spark.query.oracle import batched_oracle_sql, composed_oracle_sql

DOCS = [
    (1, "data table scan join"),
    (2, "data noise table scan"),
    (3, "database merge table"),
    (4, "table scan merge data"),
    (5, "join merge scan table"),
    (6, "data data table scan extra"),
]


@pytest.fixture()
def con():
    c = duckdb.connect()
    rows = ", ".join(f"({i}, '{t}')" for i, t in DOCS)
    c.execute(f"CREATE VIEW documents AS SELECT * FROM (VALUES {rows}) "
              "t(doc_id, text)")
    return c


def test_matches_handwritten_mixed_oracle(con):
    import __spark_entry__ as entry

    got = con.sql(
        composed_oracle_sql(entry.SEARCH_MIXED_QUERY, k=10)
    ).fetchall()
    want = con.sql(entry._search_mixed_oracle()).fetchall()
    assert got == want
    assert got, "mixed query must match something in the fixture corpus"


def test_negation_excludes(con):
    rows = con.sql(composed_oracle_sql("data -noise", k=10)).fetchall()
    ids = {r[1] for r in rows}
    assert 2 not in ids and 1 in ids


def test_phrase_filters_order(con):
    rows = con.sql(composed_oracle_sql('"scan table"', k=10)).fetchall()
    ids = {r[1] for r in rows}
    # only doc 5 has 'scan table' adjacent in order
    assert ids == {5}


def test_near_window(con):
    # 'data' within 2 of 'scan', any order: doc1 (d@0,s@2), doc2 (d@0..
    # no: scan@3 gap3; data? doc2 'data noise table scan' gap 3 -> no),
    # doc4 (scan@1, data@3, gap 2), doc6 (data@1, scan@3, gap 2)
    rows = con.sql(composed_oracle_sql('"data scan"~2', k=10)).fetchall()
    assert {r[1] for r in rows} == {1, 4, 6}
    # ordered: data must precede scan
    rows = con.sql(composed_oracle_sql('"data scan"~>2', k=10)).fetchall()
    assert {r[1] for r in rows} == {1, 6}


def test_group_conjunction(con):
    rows = con.sql(composed_oracle_sql("data merge", k=10)).fetchall()
    ids = {r[1] for r in rows}
    assert ids == {4}  # 'database' (doc 3) doesn't match the term 'data'


def test_glob_group(con):
    rows = con.sql(composed_oracle_sql("dat* merge", k=10)).fetchall()
    ids = {r[1] for r in rows}
    assert ids == {3, 4}  # database now matches dat*


def test_no_positive_raises():
    with pytest.raises(ValueError):
        composed_oracle_sql("-onlyneg")


def test_batched_union_tags_slices(con):
    sql = batched_oracle_sql({
        "a": composed_oracle_sql("data", k=3),
        "b": composed_oracle_sql("merge", k=3),
    })
    rows = con.sql(sql).fetchall()
    by_q = {}
    for qid, rank, doc_id, score in rows:
        by_q.setdefault(qid, []).append((rank, doc_id, score))
    assert set(by_q) == {"a", "b"}
    assert by_q["a"] == sorted(by_q["a"])  # ranks contiguous per slice
