"""Incremental ingestion: new docs streamed into an existing index must
make index-backed queries rank-identical to a full-scan over the UNION
corpus — with idempotent restarts."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from glug_spark.index.pipeline import build_index
from glug_spark.query import bm25, wand
from glug_spark.streaming.ingest import ingest_available, refresh_stats
from tests.conftest import SF_DIR

QUERIES = [
    (["data"], 10, False),
    (["data", "join"], 10, True),
    (["table", "scan", "merge"], 25, False),
]


@pytest.fixture(scope="module")
def ingested(spark):
    base = tempfile.mkdtemp(prefix="glug_stream_")
    initial = os.path.join(base, "initial")
    arrivals = os.path.join(base, "arrivals")
    index = os.path.join(base, "index")
    os.makedirs(arrivals)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.where(F.col("doc_id") < 300).write.parquet(
        os.path.join(initial, "documents.parquet")
    )
    build_index(spark, initial, index, n_buckets=8)

    # wave 1 arrives
    docs.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 420)).write.parquet(
        os.path.join(arrivals, "wave1.parquet")
    )
    s1 = ingest_available(spark, arrivals, index, n_buckets=8)
    assert s1["n_docs"] == 420

    # wave 2 arrives later; rerun drains only the new file
    docs.where(F.col("doc_id") >= 420).write.parquet(
        os.path.join(arrivals, "wave2.parquet")
    )
    s2 = ingest_available(spark, arrivals, index, n_buckets=8)
    assert s2["n_docs"] == docs.count()

    yield index, docs
    shutil.rmtree(base, ignore_errors=True)


@pytest.mark.parametrize("terms,k,conjunctive", QUERIES)
def test_ingested_rank_identical(spark, ingested, terms, k, conjunctive):
    index, docs = ingested
    expected = [
        tuple(r)
        for r in bm25.bm25_topk(docs, terms, k=k, conjunctive=conjunctive).collect()
    ]
    actual = [
        tuple(r)
        for r in wand.wand_topk(spark, index, terms, k=k,
                                conjunctive=conjunctive, n_buckets=8).collect()
    ]
    assert actual == expected


def test_ingest_restart_is_idempotent(spark, ingested):
    index, docs = ingested
    before = spark.read.parquet(f"{index}/postings").count()
    # same arrivals dir, nothing new: the drained source re-delivers
    # nothing, stats stay consistent
    s = ingest_available(
        spark, os.path.dirname(index) + "/arrivals", index, n_buckets=8
    )
    assert s["n_docs"] == docs.count()
    assert spark.read.parquet(f"{index}/postings").count() == before


def test_ingested_phrase_identical(spark, ingested):
    index, docs = ingested
    expected = [r["doc_id"] for r in bm25.phrase_docs(docs, ["table", "scan"]).collect()]
    actual = [
        r["doc_id"]
        for r in wand.phrase_docs_indexed(spark, index, ["table", "scan"],
                                          n_buckets=8).collect()
    ]
    assert actual == expected


def test_refresh_stats_consistent(spark, ingested):
    index, docs = ingested
    stats = refresh_stats(spark, index)
    coll = spark.read.parquet(f"{index}/collection").collect()[0]
    assert coll["n_docs"] == docs.count() == stats["n_docs"]


def test_compact_ingest_compact_interplay(spark, tmp_path):
    """build → compact → ingest a wave → compact again: the second
    compaction must coarsen the stream-appended segments too (they
    were unknown to the first segmap), and every state must stay
    rank-identical."""
    from glug_spark.index.compact import compact_index, read_segmap

    initial = str(tmp_path / "initial")
    arrivals = str(tmp_path / "arrivals")
    index = str(tmp_path / "index")
    os.makedirs(arrivals)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        docs.where(F.col("doc_id") < 300).write.parquet(
            os.path.join(initial, "documents.parquet")
        )
        build_index(spark, initial, index, n_buckets=8)
        compact_index(spark, index, min_run=1000, merge_factor=1000)

        docs.where(F.col("doc_id") >= 300).write.parquet(
            os.path.join(arrivals, "wave.parquet")
        )
        ingest_available(spark, arrivals, index, n_buckets=8)
    finally:
        spark.conf.set(key, prev)

    def check(tag):
        for terms, k, conj in QUERIES:
            want = [tuple(r) for r in
                    bm25.bm25_topk(docs, terms, k=k, conjunctive=conj).collect()]
            got = [tuple(r) for r in
                   wand.wand_topk(spark, index, terms, k=k, conjunctive=conj,
                                  n_buckets=8).collect()]
            assert got == want, (tag, terms)

    check("after-ingest")
    summary = compact_index(spark, index, min_run=1000, merge_factor=1000)
    assert summary["groups"] == 1  # stream segments coarsened too
    m = read_segmap(spark, index).collect()
    segs_on_disk = {
        r["segment"]
        for r in spark.read.parquet(f"{index}/postings").select("segment")
        .distinct().collect()
    }
    assert segs_on_disk <= ({r["grp"] for r in m} | {r["segment"] for r in m})
    check("after-recompact")
