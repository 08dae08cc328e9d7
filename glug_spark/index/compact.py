"""Index compaction: merge fragmented per-segment posting runs.

The zero-shuffle build writes one run per (term, segment-batch). Head
terms produce full runs everywhere (good — that's the parallel fan-out),
but TAIL terms produce one tiny run per segment they appear in: at
10^12 docs with ~10^6 segments, a df=10^6 term owns 10^6 metadata rows
of a few postings each. Compaction rewrites, per bucket, every term
whose average run is smaller than ``min_run`` into a single merged run
(segment = -1), decoding → doc_id-sorted merge → re-encode, positions
included. Query results are unaffected (the reader already merges runs
in any segment arrangement); only row count and read amplification
drop. Runs one groupBy(bucket, term) over the *encoded* rows — tiny
next to the corpus — and is itself skew-free (head terms keep their
segmented layout and skip the merge entirely).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from glug_spark.index import codec
from glug_spark.index.pipeline import ENCODED_SCHEMA


def _merge_term(pdf: pd.DataFrame) -> pd.DataFrame:
    """All runs of one term (within a bucket) → one compacted run."""
    bucket = int(pdf["bucket"].iloc[0])
    term = pdf["term"].iloc[0]

    ids_l, tfs_l, dls_l, pos_l = [], [], [], []
    for row in pdf.to_dict("records"):
        ids, tfs, dls = codec.decode_segment(row)
        plists = codec.decode_positions(row["positions"], tfs)
        ids_l.append(ids)
        tfs_l.append(tfs)
        dls_l.append(dls)
        pos_l.extend(plists)
    ids = np.concatenate(ids_l)
    tfs = np.concatenate(tfs_l)
    dls = np.concatenate(dls_l)
    order = np.argsort(ids, kind="stable")
    pos_sorted = [pos_l[i] for i in order]
    ids, tfs, dls = ids[order], tfs[order], dls[order]

    pos_flat = (
        np.concatenate(pos_sorted).astype(np.uint64)
        if pos_sorted else np.zeros(0, np.uint64)
    )
    runs = codec.encode_runs(
        np.zeros(len(ids), dtype=np.int64), ids, tfs, dls, pos_flat
    )
    assert len(runs) == 1
    run = runs[0]
    run.pop("run_start")
    return pd.DataFrame([{
        "bucket": bucket, "term": term, "segment": -1,
        "cf_local": int(tfs.sum()), **run,
    }])


def compact_index(
    spark: SparkSession,
    index_dir: str,
    min_run: int = 64,
) -> dict:
    """Rewrite ``postings/`` with fragmented tail terms merged.

    A term is compacted when its mean run length < ``min_run`` AND it
    has more than one run. Returns before/after row counts.
    """
    src = os.path.join(index_dir, "postings")
    enc = spark.read.parquet(src)

    per_term = enc.groupBy("bucket", "term").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.sum("df_local").alias("df"),
    )
    tail = per_term.where(
        (F.col("n_runs") > 1) & (F.col("df") / F.col("n_runs") < min_run)
    ).select("bucket", "term")

    fragmented = enc.join(F.broadcast(tail), ["bucket", "term"], "left_semi")
    untouched = enc.join(F.broadcast(tail), ["bucket", "term"], "left_anti")

    merged = fragmented.groupBy("bucket", "term").applyInPandas(
        _merge_term, schema=ENCODED_SCHEMA
    )

    before = enc.count()
    tmp = os.path.join(index_dir, "postings_compacted")
    (
        untouched.select([f.name for f in ENCODED_SCHEMA])
        .unionByName(merged)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp)
    )
    after = spark.read.parquet(tmp).count()

    shutil.rmtree(src)
    os.rename(tmp, src)
    return {"rows_before": before, "rows_after": after, "min_run": min_run}
