"""Incremental index ingestion via Structured Streaming.

New documents arriving in a directory (the streaming analog of new
Iceberg snapshots) are encoded into ADDITIONAL index segments with the
same zero-shuffle encoder the batch build uses — an inverted index
whose doc space is partitioned by segments composes under append, so
ingestion is: encode new docs → append segment rows → refresh the
(metadata-sized) stats tables. Queries pick up the new docs on their
next run with no index rebuild; rank-identity vs a full-scan over the
union corpus is asserted by tests.

Consistency model: ``foreachBatch`` + a stream manifest row per
completed micro-batch (written AFTER the postings append) makes
restarts idempotent at micro-batch granularity — a re-delivered batch
whose id is already recorded is skipped. The window between the
postings append and the manifest write is the standard at-least-once
residue; on a real deployment the append itself would be an Iceberg
transaction and the manifest a snapshot property, closing it.

Segment ids are salted into a dedicated namespace per micro-batch
(``STREAM_ATTEMPT_BASE + batch_id``) so they can never collide with
batch-build attempts — the doc-partitioning invariant survives.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from glug_spark.index.pipeline import (
    ATTEMPT_SPAN,
    ENCODED_SCHEMA,
    _make_partition_encoder,
    bucket_col,
)

#: stream micro-batches live far above any plausible resume attempt
STREAM_ATTEMPT_BASE = 100_000

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _stream_manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stream_manifest")


def _done_batches(spark: SparkSession, index_dir: str) -> set[int]:
    p = _stream_manifest_path(index_dir)
    if not os.path.exists(p):
        return set()
    return {
        int(r["batch_id"]) for r in spark.read.parquet(p).collect()
    }


def refresh_stats(spark: SparkSession, index_dir: str) -> dict:
    """Recompute term_stats + collection from the encoded postings.

    Aggregates the ENCODED rows (metadata-scale: one row per term run,
    not per posting) — the same strategy as the batch build. n_docs is
    the batch-build count plus every ingested micro-batch's count.
    """
    params = spark.read.parquet(os.path.join(index_dir, "params")).collect()[0]
    n_docs = int(params["n_docs"])
    smp = _stream_manifest_path(index_dir)
    if os.path.exists(smp):
        extra = spark.read.parquet(smp).agg(F.sum("n_docs")).collect()[0][0]
        n_docs += int(extra or 0)

    enc = spark.read.parquet(os.path.join(index_dir, "postings"))
    n_buckets = int(params["n_buckets"])
    stats = (
        enc.groupBy("term")
        .agg(F.sum("df_local").alias("df"), F.sum("cf_local").alias("cf"))
        .withColumn("bucket", bucket_col(n_buckets=n_buckets))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .drop("cf")
    )
    stats.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(index_dir, "term_stats")
    )
    total_tokens = int(
        enc.agg(F.sum("cf_local")).collect()[0][0] or 0
    )
    avgdl = total_tokens / n_docs if n_docs else 0.0
    spark.createDataFrame(
        [(n_docs, avgdl, total_tokens)],
        "n_docs long, avgdl double, total_tokens long",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "collection"))
    return {"n_docs": n_docs, "avgdl": avgdl, "total_tokens": total_tokens}


def ingest_batch(spark: SparkSession, batch_df: DataFrame, batch_id: int,
                 index_dir: str, n_buckets: int) -> int:
    """Encode one micro-batch into appended segments. Idempotent per
    batch_id. Returns docs ingested (0 when skipped/empty)."""
    if int(batch_id) in _done_batches(spark, index_dir):
        return 0
    n_new = batch_df.count()
    if n_new == 0:
        return 0
    attempt = STREAM_ATTEMPT_BASE + int(batch_id)
    assert attempt * ATTEMPT_SPAN < 2**62
    encoded = batch_df.select(
        "doc_id", "text", F.input_file_name().alias("_file")
    ).mapInPandas(
        _make_partition_encoder(n_buckets, set(), attempt),
        schema=ENCODED_SCHEMA,
    )
    encoded.sortWithinPartitions("bucket", "term").write.mode(
        "append"
    ).partitionBy("bucket").parquet(os.path.join(index_dir, "postings"))
    spark.createDataFrame(
        [(int(batch_id), int(n_new))], "batch_id long, n_docs long"
    ).write.mode("append").parquet(_stream_manifest_path(index_dir))
    return int(n_new)


def ingest_available(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    n_buckets: int = 16,
    checkpoint: str | None = None,
) -> dict:
    """Drain everything currently available in ``input_dir`` into the
    index (Trigger.AvailableNow), then refresh stats once.

    The stream source is the directory listing (new parquet files =
    new docs); the checkpoint directory carries source progress across
    restarts, the stream manifest makes the sink idempotent.
    """
    checkpoint = checkpoint or os.path.join(index_dir, "stream_checkpoint")
    # recursive lookup: arrivals land as whole parquet DIRECTORIES
    # (one per upstream write), not bare files
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, batch_id, index_dir, n_buckets)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return refresh_stats(spark, index_dir)
