"""Index build + index-backed query vs full-scan reference scorer.

The gate: WAND/MaxScore top-k from the encoded index must be
rank-identical (same doc_ids, same order, same rounded scores) to the
declarative full-scan BM25 plan for a battery of queries — the engine's
analog of the reference's glug-vs-git parity suite.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from glug_spark.index.pipeline import build_index
from glug_spark.query import bm25, wand
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def index_dir(spark):
    d = tempfile.mkdtemp(prefix="glug_index_test_")
    summary = build_index(spark, SF_DIR, d, n_buckets=8, n_segments=4)
    assert summary["n_docs"] == 500
    assert summary["n_postings"] > 0
    yield d
    shutil.rmtree(d, ignore_errors=True)


QUERY_BATTERY = [
    (["data"], 10, False),
    (["data"], 100, False),
    (["the"], 10, False),          # head term (stopword skew)
    (["vector"], 10, False),
    (["data", "join"], 10, True),
    (["table", "scan", "merge"], 10, False),
    (["table", "scan", "merge"], 50, False),
    (["spark", "window", "the"], 10, True),
    (["nosuchterm"], 10, False),
    (["nosuchterm", "data"], 10, True),
    (["nosuchterm", "data"], 10, False),
]


@pytest.mark.parametrize("terms,k,conjunctive", QUERY_BATTERY)
def test_wand_rank_identical(spark, index_dir, terms, k, conjunctive):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = [
        tuple(r)
        for r in bm25.bm25_topk(docs, terms, k=k, conjunctive=conjunctive).collect()
    ]
    actual = [
        tuple(r)
        for r in wand.wand_topk(
            spark, index_dir, terms, k=k, conjunctive=conjunctive, n_buckets=8
        ).collect()
    ]
    assert actual == expected


@pytest.mark.parametrize(
    "phrase",
    [["table", "scan"], ["the", "the"], ["fast", "key", "order"], ["no", "match"]],
)
def test_phrase_rank_identical(spark, index_dir, phrase):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = [r["doc_id"] for r in bm25.phrase_docs(docs, phrase).collect()]
    actual = [
        r["doc_id"]
        for r in wand.phrase_docs_indexed(spark, index_dir, phrase, n_buckets=8).collect()
    ]
    assert actual == expected


def test_resume_skips_completed_segments(spark, index_dir):
    # a fresh resume over a complete index redoes nothing
    summary = build_index(
        spark, SF_DIR, index_dir, n_buckets=8, n_segments=4, resume=True
    )
    assert summary["resumed_segments_skipped"] == summary["segments"] > 0
    assert summary["n_postings"] > 0
