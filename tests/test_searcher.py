"""Searcher (query-many handle) must be rank-identical to the
module-level paths and to the full-scan scorer, including on a
compacted index and for composed queries."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from glug_spark.index.compact import compact_index
from glug_spark.index.pipeline import build_index
from glug_spark.query import bm25
from glug_spark.query.execute import search
from glug_spark.query.searcher import Searcher
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def searcher(spark):
    d = tempfile.mkdtemp(prefix="glug_searcher_")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        build_index(spark, SF_DIR, d, n_buckets=8)
    finally:
        spark.conf.set(key, prev)
    compact_index(spark, d, min_run=8, merge_factor=4)  # mixed layout
    with Searcher(spark, d, n_buckets=8, persist=True) as s:
        yield s
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("terms,k,conjunctive", [
    (["data"], 10, False),
    (["the", "dup"], 10, False),
    (["data", "join"], 10, True),
    (["table", "scan", "merge"], 50, False),
    (["nosuchterm", "data"], 10, True),
])
def test_searcher_topk_identical(spark, searcher, terms, k, conjunctive):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = [
        tuple(r)
        for r in bm25.bm25_topk(docs, terms, k=k, conjunctive=conjunctive).collect()
    ]
    got = [tuple(r) for r in searcher.topk(terms, k=k, conjunctive=conjunctive).collect()]
    assert got == expected


@pytest.mark.parametrize("query", [
    "data join",
    "dat* -noise",
    'the "table scan"',
    '"the the" -data',
])
def test_searcher_search_identical(spark, searcher, query):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = [tuple(r) for r in search(docs, query, k=10).collect()]
    got = [tuple(r) for r in searcher.search(query, k=10).collect()]
    assert got == expected, query


def test_searcher_phrase_identical(spark, searcher):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = [r["doc_id"] for r in bm25.phrase_docs(docs, ["table", "scan"]).collect()]
    got = [r["doc_id"] for r in searcher.phrase_docs(["table", "scan"]).collect()]
    assert got == expected


def test_topk_many_matches_individual(spark, searcher):
    queries = {
        "q1": ["data"],
        "q2": ["table", "scan", "merge"],
        "q3": ["the", "dup"],
        "q4": ["nosuchterm"],
        "q5": ["data", "join"],
    }
    batched = searcher.topk_many(queries, k=10).collect()
    by_query: dict[str, list] = {}
    for r in batched:
        by_query.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid, terms in queries.items():
        want = [tuple(r) for r in searcher.topk(terms, k=10).collect()]
        got = sorted(by_query.get(qid, []))
        assert got == want, qid


def test_search_many_matches_individual(spark, searcher):
    queries = {
        "a": "data join",
        "b": 'dat* -noise',
        "c": 'the "table scan"',
        "d": '"the the" -data',
        "e": "table,scan merge",
    }
    batched = searcher.search_many(queries, k=10).collect()
    by_query: dict[str, list] = {}
    for r in batched:
        by_query.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid, q in queries.items():
        want = [tuple(r) for r in searcher.search(q, k=10).collect()]
        got = sorted(by_query.get(qid, []))
        assert got == want, (qid, q)
