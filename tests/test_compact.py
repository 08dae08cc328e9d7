"""Compaction must shrink fragmented runs and leave EVERY query result
rank-identical (the reader's merge is layout-agnostic)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from glug_spark.index.compact import compact_index
from glug_spark.index.pipeline import build_index
from glug_spark.query import bm25, wand
from tests.conftest import SF_DIR

QUERIES = [
    (["data"], 10, False),
    (["the"], 10, False),
    (["data", "join"], 10, True),
    (["table", "scan", "merge"], 50, False),
]


@pytest.fixture(scope="module")
def compacted_index(spark):
    d = tempfile.mkdtemp(prefix="glug_compact_")
    # small Arrow batches → many segments → fragmented runs to merge
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        build_index(spark, SF_DIR, d, n_buckets=8)
    finally:
        spark.conf.set(key, prev)
    summary = compact_index(spark, d, min_run=1000)  # force-merge everything
    yield d, summary
    shutil.rmtree(d, ignore_errors=True)


def test_compaction_shrinks(spark, compacted_index):
    _, summary = compacted_index
    assert summary["rows_after"] < summary["rows_before"]


@pytest.mark.parametrize("terms,k,conjunctive", QUERIES)
def test_compacted_rank_identical(spark, compacted_index, terms, k, conjunctive):
    d, _ = compacted_index
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = [
        tuple(r)
        for r in bm25.bm25_topk(docs, terms, k=k, conjunctive=conjunctive).collect()
    ]
    actual = [
        tuple(r)
        for r in wand.wand_topk(spark, d, terms, k=k, conjunctive=conjunctive,
                                n_buckets=8).collect()
    ]
    assert actual == expected


def test_compacted_phrase_identical(spark, compacted_index):
    d, _ = compacted_index
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = [r["doc_id"] for r in bm25.phrase_docs(docs, ["table", "scan"]).collect()]
    actual = [
        r["doc_id"]
        for r in wand.phrase_docs_indexed(spark, d, ["table", "scan"], n_buckets=8).collect()
    ]
    assert actual == expected
