"""Incremental index ingestion via Structured Streaming.

New documents arriving in a directory (the streaming analog of new
Iceberg snapshots) are encoded into ADDITIONAL index segments with the
same zero-shuffle encoder the batch build uses — an inverted index
whose doc space is partitioned by segments composes under append, so
ingestion is: encode new docs → append segment rows → merge the new
segments' stats into the (vocab-sized) stats tables. Queries pick up
the new docs on their next run with no index rebuild; rank-identity vs
a full-scan over the union corpus is asserted by tests.

Consistency model: ``foreachBatch`` + a stream manifest row per
completed micro-batch (written AFTER the postings append) makes
restarts idempotent at micro-batch granularity. The window between the
postings append and the manifest write is closed by RECOVERY, not by
praying: every batch's segments live in their own id namespace
(``STREAM_ATTEMPT_BASE + batch_id``), so a replayed batch first checks
its namespace — rows already present mean the previous attempt crashed
after the (job-atomic) append; the replay validates that the namespace
covers exactly this batch's docs and ADOPTS it by writing the missing
manifest row, or fails loudly on a partial append. A batch is therefore
never encoded twice (the doc-space partition invariant survives every
crash point). On a real deployment the append would be one Iceberg
transaction; the recovery path is the parquet-dir equivalent.
(Caveat: run a pending recovery BEFORE ``compact_index`` — compaction
may rewrite an orphaned namespace's rows under a merged segment id,
hiding them from the namespace probe.)

doc_id contract: doc_ids are globally unique across the batch build and
every ingested batch — a colliding id would land the same doc in two
segments and score it twice. ``ingest_available`` enforces this with a
watermark check (max indexed doc_id, read from block metadata, never
from decoded postings): each batch's min doc_id must exceed it.

Stats refresh is INCREMENTAL: only the not-yet-folded batches' encoded
rows (pushed down on the segment-id namespace) are aggregated and
merged into term_stats via a vocab-sized outer join — never a full
re-aggregation of all encoded rows per drain. The folded-batch state
rides inside the term_stats directory (an ``_``-prefixed subdir, which
parquet readers ignore) and is swapped atomically with the stats
themselves, so a crash mid-refresh self-heals: a missing/partial
term_stats dir simply triggers a full recompute on the next refresh.
"""

from __future__ import annotations

import os
import shutil

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

#: folded-batch state rows: one per folded batch (total_tokens NULL)
#: plus a single summary row with batch_id = -1 carrying the running
#: collection token total
_STATE_SCHEMA = "batch_id long, total_tokens long"


def _stream_manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stream_manifest")


def _stats_state_path(index_dir: str) -> str:
    # inside term_stats/: the leading underscore hides it from parquet
    # directory listings, and the refresh's directory swap moves state
    # and stats together (atomically, via one os.rename)
    return os.path.join(index_dir, "term_stats", "_stats_state")


def _batch_range(batch_id: int) -> tuple[int, int]:
    attempt = STREAM_ATTEMPT_BASE + int(batch_id)
    return attempt * ATTEMPT_SPAN, (attempt + 1) * ATTEMPT_SPAN


def _done_batches(spark: SparkSession, index_dir: str) -> set[int]:
    p = _stream_manifest_path(index_dir)
    if not os.path.exists(p):
        return set()
    return {
        int(r["batch_id"]) for r in spark.read.parquet(p).collect()
    }


def _read_state(spark: SparkSession, index_dir: str):
    """(folded batch ids, running total_tokens) or None if no state."""
    p = _stats_state_path(index_dir)
    if not os.path.exists(p):
        return None
    rows = spark.read.parquet(p).collect()
    folded = {int(r["batch_id"]) for r in rows if r["batch_id"] >= 0}
    total = next(
        (int(r["total_tokens"]) for r in rows if r["batch_id"] == -1), 0
    )
    return folded, total


def _indexed_doc_watermark(spark: SparkSession, index_dir: str) -> int:
    """Max indexed doc_id, from block METADATA (block_last holds each
    block's last doc_id) — no posting blob is ever decoded."""
    row = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .agg(F.max(F.element_at("block_last", -1)).alias("m"))
        .collect()[0]
    )
    return int(row["m"]) if row["m"] is not None else -1


def _write_stats(spark: SparkSession, index_dir: str, stats: DataFrame,
                 folded: set[int], total_tokens: int, n_docs: int) -> dict:
    """Stage merged term_stats + folded state, swap atomically, then
    rewrite the collection row. Crash anywhere → next refresh either
    sees the OLD consistent state (refolds) or no term_stats at all
    (full recompute); folded state can never outrun the stats it
    describes because they move in the same rename."""
    stats_path = os.path.join(index_dir, "term_stats")
    stage = stats_path + ".stage"
    if os.path.exists(stage):
        shutil.rmtree(stage)
    stats.write.mode("overwrite").partitionBy("bucket").parquet(stage)
    state_rows = [(int(b), None) for b in sorted(folded)]
    state_rows.append((-1, int(total_tokens)))
    spark.createDataFrame(state_rows, _STATE_SCHEMA).write.mode(
        "overwrite"
    ).parquet(os.path.join(stage, "_stats_state"))
    if os.path.exists(stats_path):
        shutil.rmtree(stats_path)
    os.rename(stage, stats_path)
    return _write_collection(spark, index_dir, n_docs, total_tokens)


def _write_collection(spark: SparkSession, index_dir: str,
                      n_docs: int, total_tokens: int) -> dict:
    from glug_spark.query import wand as _wand

    avgdl = total_tokens / n_docs if n_docs else 0.0
    spark.createDataFrame(
        [(int(n_docs), avgdl, int(total_tokens))],
        "n_docs long, avgdl double, total_tokens long",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "collection"))
    _wand.invalidate_collection_cache(index_dir)
    return {"n_docs": n_docs, "avgdl": avgdl, "total_tokens": total_tokens}


def _idf(df_col, n_docs: int):
    return F.log(
        1.0
        + (F.lit(n_docs) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def refresh_stats(spark: SparkSession, index_dir: str) -> dict:
    """Fold any not-yet-folded stream batches into term_stats/collection.

    Incremental: aggregates ONLY the new batches' encoded rows (the scan
    is pushed down on their segment-id namespaces) and merges df counts
    into the existing vocab-sized term_stats with one outer join; idf is
    recomputed column-wise for the new n_docs. Falls back to a full
    recompute over all encoded rows when there is no usable state
    (legacy index, or a crash torched term_stats mid-swap).

    Ordering contract: fold BEFORE compacting — ``compact_index`` may
    rewrite an unfolded batch's rows under a merged segment id outside
    its namespace, hiding them from the delta scan (``ingest_available``
    always folds at drain end, so the contract only binds direct
    ``ingest_batch`` users). Compaction itself never changes df/cf
    totals, so already-folded stats stay exact under any layout.
    """
    params = spark.read.parquet(os.path.join(index_dir, "params")).collect()[0]
    n_buckets = int(params["n_buckets"])
    n_docs = int(params["n_docs"])
    done: set[int] = set()
    smp = _stream_manifest_path(index_dir)
    if os.path.exists(smp):
        manifest = spark.read.parquet(smp).collect()
        done = {int(r["batch_id"]) for r in manifest}
        n_docs += sum(int(r["n_docs"] or 0) for r in manifest)

    stats_path = os.path.join(index_dir, "term_stats")
    state = (
        _read_state(spark, index_dir) if os.path.exists(stats_path) else None
    )
    if state is None and os.path.exists(stats_path) and not done:
        # batch-build-only index (build writes no state): nothing to fold
        coll = spark.read.parquet(
            os.path.join(index_dir, "collection")
        ).collect()[0]
        return {k: coll[k] for k in ("n_docs", "avgdl", "total_tokens")}

    enc = spark.read.parquet(os.path.join(index_dir, "postings"))
    if state is None:
        # no trustworthy state → full recompute (also writes state so
        # every later refresh is incremental)
        stats = (
            enc.groupBy("term")
            .agg(F.sum("df_local").alias("df"))
            .withColumn("bucket", bucket_col(n_buckets=n_buckets))
            .withColumn("idf", _idf(F.col("df"), n_docs))
        )
        total = int(enc.agg(F.sum("cf_local")).collect()[0][0] or 0)
        return _write_stats(spark, index_dir, stats, done, total, n_docs)

    folded, total = state
    new_batches = sorted(done - folded)
    if not new_batches:
        # idempotent heal: a crash between the stats swap and the
        # collection write leaves a stale collection row — rewrite it
        # from the state the swap committed
        return _write_collection(spark, index_dir, n_docs, total)

    rng = F.lit(False)
    for b in new_batches:
        lo, hi = _batch_range(b)
        rng = rng | ((F.col("segment") >= lo) & (F.col("segment") < hi))
    delta = (
        enc.where(rng)
        .groupBy("term")
        .agg(
            F.sum("df_local").alias("df_new"),
            F.sum("cf_local").alias("cf_new"),
        )
    ).cache()
    try:
        delta_tokens = int(delta.agg(F.sum("cf_new")).collect()[0][0] or 0)
        old = spark.read.parquet(stats_path).select("term", "df")
        merged = (
            old.join(delta.select("term", "df_new"), "term", "full_outer")
            .select(
                "term",
                (F.coalesce("df", F.lit(0))
                 + F.coalesce("df_new", F.lit(0))).alias("df"),
            )
            .withColumn("bucket", bucket_col(n_buckets=n_buckets))
            .withColumn("idf", _idf(F.col("df"), n_docs))
        )
        return _write_stats(
            spark, index_dir, merged, folded | set(new_batches),
            total + delta_tokens, n_docs,
        )
    finally:
        delta.unpersist()


def _adopt_or_none(spark: SparkSession, index_dir: str, batch_id: int,
                   n_new: int) -> bool:
    """True iff a previous attempt's append for this batch is already on
    disk (crash after append, before the manifest row). Validates that
    the namespace covers exactly this batch's docs — a partial append
    (crash mid-job-commit) fails loudly rather than double-encoding."""
    lo, hi = _batch_range(batch_id)
    leftover = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .where((F.col("segment") >= lo) & (F.col("segment") < hi))
        .groupBy("segment")
        .agg(F.first("n_docs_batch").alias("nd"))
    ).collect()
    if not leftover:
        return False
    covered = sum(int(r["nd"] or 0) for r in leftover)
    if covered != n_new:
        raise RuntimeError(
            f"stream batch {batch_id}: orphaned segments cover {covered} "
            f"docs but the replayed batch has {n_new} — partial append "
            "from a crashed attempt (or the namespace was compacted "
            "before recovery); clean segments in "
            f"[{lo}, {hi}) and re-run"
        )
    return True


def ingest_batch(spark: SparkSession, batch_df: DataFrame, batch_id: int,
                 index_dir: str, n_buckets: int,
                 watermark: list[int] | None = None,
                 done: set[int] | None = None) -> int:
    """Encode one micro-batch into appended segments. Idempotent per
    batch_id, crash-recoverable per attempt (see module docstring).
    ``watermark``: optional single-element mutable cell holding the max
    already-indexed doc_id — enforces the unique-doc_id contract and is
    advanced in place. ``done``: the already-committed batch-id set; a
    long drain passes one set read ONCE at start (and updated in place
    here) instead of re-listing the manifest per micro-batch — at 10^6
    batches the per-batch re-read would be quadratic. Returns docs
    ingested (0 when skipped/empty)."""
    if done is None:
        done = _done_batches(spark, index_dir)
    if int(batch_id) in done:
        return 0
    agg = batch_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).collect()[0]
    n_new = int(agg["n"])
    if n_new == 0:
        return 0
    adopted = _adopt_or_none(spark, index_dir, batch_id, n_new)
    if not adopted:
        if watermark is not None and int(agg["lo"]) <= watermark[0]:
            raise ValueError(
                f"stream batch {batch_id}: doc_id {agg['lo']} is not "
                f"above the indexed watermark {watermark[0]} — doc_ids "
                "must be globally unique across the build and every "
                "ingested batch (a collision would score the doc twice)"
            )
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
    if watermark is not None:
        watermark[0] = max(watermark[0], int(agg["hi"]))
    spark.createDataFrame(
        [(int(batch_id), int(n_new))], "batch_id long, n_docs long"
    ).write.mode("append").parquet(_stream_manifest_path(index_dir))
    done.add(int(batch_id))
    return int(n_new)


def ingest_available(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    n_buckets: int = 16,
    checkpoint: str | None = None,
    validate_doc_ids: bool = True,
) -> dict:
    """Drain everything currently available in ``input_dir`` into the
    index (Trigger.AvailableNow), then fold the new batches' stats once.

    The stream source is the directory listing (new parquet files =
    new docs); the checkpoint directory carries source progress across
    restarts, the stream manifest + namespace recovery make the sink
    exactly-once at micro-batch granularity.
    """
    checkpoint = checkpoint or os.path.join(index_dir, "stream_checkpoint")
    # recursive lookup: arrivals land as whole parquet DIRECTORIES
    # (one per upstream write), not bare files
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(input_dir)
    )
    wm = (
        [_indexed_doc_watermark(spark, index_dir)]
        if validate_doc_ids else None
    )
    done = _done_batches(spark, index_dir)  # one manifest read per drain

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(spark, batch_df, batch_id, index_dir, n_buckets,
                     watermark=wm, done=done)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return refresh_stats(spark, index_dir)
