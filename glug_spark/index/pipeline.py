"""Index build pipeline: documents → encoded posting-list partitions.

Physical layout under ``out_dir``:

- ``postings/``   parquet, ``partitionBy(bucket)`` where ``bucket =
  md5-derived(term) % n_buckets`` — a query's term lookup prunes to one
  bucket directory, and the bucket is computable driver-side in Python.
  Rows are (term, segment, df_local, cf_local, blobs, block metadata).
- ``term_stats/`` parquet (term, df, idf, bucket) — same bucketing.
- ``collection/`` parquet single row (n_docs, avgdl, total_tokens, lo,
  seg_size).
- ``params/``     build parameters written BEFORE encoding starts so an
  interrupted build can resume with identical segmentation.
- ``manifest/``   parquet, one row per SEGMENT: lineage (input path,
  doc range) + counters (terms, postings, encoded bytes). Resume
  anti-joins pending segments and the skip is a doc_id RANGE predicate,
  i.e. it pushes down to the input scan — completed doc ranges are
  neither read nor recomputed (north rule: "resumable from checkpoint
  with per-partition lineage + metrics").

Dataflow (the part that must survive 10^12 docs):

    documents ──(ONE shuffle: group docs by doc-space segment)──▶
    Arrow worker [tokenize → postings → delta+varbyte encode, all
    vectorized] ──▶ bucketed parquet

- The only shuffle moves DOCUMENT rows (text), never token rows: an
  earlier token-row design moved ~20× more rows through shuffle +
  Arrow and spent 75% of its cycles in the kernel; tokenizing inside
  the Arrow worker (as the north star prescribes) removed that wall.
- ``segment = floor((doc_id - lo) / seg_size)`` is monotone in doc_id,
  so per-(term, segment) encoded runs concatenate in segment order into
  globally doc_id-sorted posting lists. Head terms ('the' at web scale)
  fan out across all segments instead of melting one task — this
  replaces groupBy-salting and also gives the query path block-aligned,
  independently decodable runs.
- No JVM aggregation anywhere in the hot path: postings fall out of a
  NumPy lexsort + run-length pass per segment (zero per-row Python).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T

from glug_spark.index import codec

ENCODED_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("term", T.StringType()),
    T.StructField("segment", T.LongType()),
    T.StructField("df_local", T.LongType()),
    T.StructField("cf_local", T.LongType()),
    T.StructField("doc_gaps", T.BinaryType()),
    T.StructField("tfs", T.BinaryType()),
    T.StructField("dls", T.BinaryType()),
    T.StructField("positions", T.BinaryType()),
    T.StructField("block_last", T.ArrayType(T.LongType())),
    T.StructField("block_max_tf", T.ArrayType(T.LongType())),
    T.StructField("gap_offsets", T.ArrayType(T.LongType())),
    T.StructField("tf_offsets", T.ArrayType(T.LongType())),
    T.StructField("dl_offsets", T.ArrayType(T.LongType())),
])


def bucket_col(term_col: str = "term", n_buckets: int = 16) -> F.Column:
    """Term → bucket. md5-derived (not xxhash64) so the DRIVER can compute
    a query term's bucket in plain Python (`python_bucket`) without a
    Spark job — term lookups prune partitions with zero planning cost."""
    return (
        F.pmod(
            F.conv(F.substring(F.md5(F.col(term_col)), 1, 15), 16, 10).cast("long"),
            F.lit(n_buckets),
        )
        .cast("int")
        .alias("bucket")
    )


def python_bucket(term: str, n_buckets: int = 16) -> int:
    """Driver-side mirror of :func:`bucket_col`."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % n_buckets


def _make_segment_encoder(n_buckets: int):
    """Arrow worker: one doc-space segment of documents → encoded rows.

    Tokenize (Python re, parity-tested against the JVM pattern), build
    postings via lexsort + run-length, varbyte-encode in two vectorized
    passes (codec.encode_runs). All O(tokens) work is NumPy.
    """
    pat = re.compile(r"\w+", re.UNICODE)

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        segment = int(pdf["segment"].iloc[0])
        token_lists = [pat.findall(t or "") for t in pdf["text"]]
        counts = np.array([len(t) for t in token_lists], dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame([], columns=[f.name for f in ENCODED_SCHEMA])

        doc_ids = np.repeat(pdf["doc_id"].to_numpy(np.int64), counts)
        dls = np.repeat(counts, counts)
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)

        flat_terms = pd.Series(
            [t for lst in token_lists for t in lst], dtype="object"
        )
        codes, uniques = pd.factorize(flat_terms, sort=False)

        order = np.lexsort((pos, doc_ids, codes))
        codes_s, doc_s, pos_s, dls_s = (
            codes[order], doc_ids[order], pos[order], dls[order]
        )
        change = np.empty(total, dtype=bool)
        change[0] = True
        change[1:] = (codes_s[1:] != codes_s[:-1]) | (doc_s[1:] != doc_s[:-1])
        run_starts = np.flatnonzero(change)
        tfs = np.diff(np.append(run_starts, total)).astype(np.int64)

        runs = codec.encode_runs(
            codes_s[run_starts], doc_s[run_starts], tfs, dls_s[run_starts],
            pos_s.astype(np.uint64),
        )
        run_codes = codes_s[run_starts]
        rows = []
        bucket_of = {}
        for run in runs:
            term = uniques[run_codes[run.pop("run_start")]]
            b = bucket_of.get(term)
            if b is None:
                b = python_bucket(term, n_buckets)
                bucket_of[term] = b
            rows.append({
                "bucket": b, "term": term, "segment": segment,
                "cf_local": 0, **run,
            })
        out = pd.DataFrame(rows)
        # cf_local per term run = sum of the run's tf values
        run_bounds = np.flatnonzero(
            np.diff(run_codes, prepend=run_codes[0] - 1)
        )
        run_ends = np.append(run_bounds[1:], len(run_codes))
        tf_cum = np.concatenate(([0], np.cumsum(tfs)))
        out["cf_local"] = [
            int(tf_cum[e] - tf_cum[s]) for s, e in zip(run_bounds, run_ends)
        ]
        return out

    return encode


def _segment_expr(lo: int, seg_size: int) -> F.Column:
    return ((F.col("doc_id") - F.lit(lo)) / F.lit(seg_size)).cast("long")


def build_index(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_buckets: int = 16,
    n_segments: int | None = None,
    resume: bool = False,
) -> dict:
    """Build the full index; returns the counter summary dict."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    params_path = os.path.join(out_dir, "params")
    manifest_path = os.path.join(out_dir, "manifest")

    done_segments: set[int] = set()
    if resume and os.path.exists(params_path):
        p = spark.read.parquet(params_path).collect()[0]
        lo, seg_size, n_buckets, n_docs = (
            p["lo"], p["seg_size"], p["n_buckets"], p["n_docs"]
        )
        if os.path.exists(manifest_path):
            done_segments = {
                r["segment"]
                for r in spark.read.parquet(manifest_path)
                .select("segment").collect()
            }
    else:
        bounds = docs.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
            F.count(F.lit(1)).alias("n_docs"),
        ).collect()[0]
        lo, hi, n_docs = bounds["lo"], bounds["hi"], bounds["n_docs"]
        if n_segments is None:
            # every core gets several segments; one segment's docs
            # (~8k docs ≈ 1.5-2M tokens) fit comfortably in a worker
            cores = spark.sparkContext.defaultParallelism
            n_segments = max(1, min(65536, max(4 * cores, n_docs // 8192)))
        seg_size = max(1, (hi - lo + n_segments) // n_segments)
        spark.createDataFrame(
            [(int(lo), int(seg_size), int(n_buckets), int(n_docs),
              os.path.abspath(sf_dir))],
            "lo long, seg_size long, n_buckets int, n_docs long, input_path string",
        ).write.mode("overwrite").parquet(params_path)

    work = docs.select("doc_id", "text").withColumn(
        "segment", _segment_expr(lo, seg_size)
    )
    if done_segments:
        # range-pushdown skip of completed doc spans
        work = work.where(~F.col("segment").isin(list(done_segments)))

    encoded = work.groupBy("segment").applyInPandas(
        _make_segment_encoder(n_buckets), schema=ENCODED_SCHEMA
    )
    (
        encoded.write.mode("append" if done_segments else "overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, "postings"))
    )

    # --- stats + manifest from the encoded index (no corpus re-scan) ----
    enc_df = spark.read.parquet(os.path.join(out_dir, "postings"))
    stats = (
        enc_df.groupBy("term")
        .agg(F.sum("df_local").alias("df"))
        .withColumn("bucket", bucket_col(n_buckets=n_buckets))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )
    stats.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(out_dir, "term_stats")
    )

    manifest = (
        enc_df.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("term").alias("n_terms"),
            F.sum("df_local").alias("n_postings"),
            F.sum("cf_local").alias("n_tokens"),
            (
                F.sum(F.length("doc_gaps")) + F.sum(F.length("tfs"))
                + F.sum(F.length("dls")) + F.sum(F.length("positions"))
            ).alias("encoded_bytes"),
        )
        .withColumn("input_path", F.lit(os.path.abspath(sf_dir)))
        .withColumn("lo", F.lit(lo))
        .withColumn("seg_size", F.lit(seg_size))
    )
    manifest.write.mode("overwrite").parquet(manifest_path)

    totals = spark.read.parquet(manifest_path).agg(
        F.sum("n_postings").alias("postings"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("encoded_bytes").alias("bytes"),
        F.count(F.lit(1)).alias("segments"),
    ).collect()[0]
    total_tokens = int(totals["tokens"])
    avgdl = float(total_tokens) / n_docs
    spark.createDataFrame(
        [(int(n_docs), avgdl, total_tokens, int(lo), int(seg_size))],
        "n_docs long, avgdl double, total_tokens long, lo long, seg_size long",
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "collection"))

    return {
        "n_docs": n_docs,
        "n_postings": int(totals["postings"]),
        "encoded_bytes": int(totals["bytes"]),
        "segments": int(totals["segments"]),
        "avgdl": avgdl,
        "resumed_segments_skipped": len(done_segments),
    }
