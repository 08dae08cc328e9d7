#!/usr/bin/env python
"""Auxiliary measurements for OPTIMIZATION_r06 (bench.py is frozen for
the driver; these isolate effects it can't).

Modes:
    --segments [sf_dir]   build the headline corpus at several segment
                          counts and time wand/batch/phrase per layout
                          (noop-sink isolation, guide §1.4)
    --explain <sf_dir>    dump .explain("formatted") for the headline
                          queries to plans/r06/
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _time(fn, repeats=3):
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def seg_sweep(sf_dir: str):
    from glug_spark.session import get_spark
    from glug_spark.index.pipeline import build_index
    from glug_spark.query.searcher import Searcher

    spark = get_spark("glug_bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 2**20))
    vocab = ["data", "join", "scan", "table", "merge", "index", "sort",
             "row", "key", "hash", "the", "a", "fast", "order",
             "window", "spark"]
    batch = {
        f"q{i}": [vocab[i % len(vocab)], vocab[(i * 7 + 3) % len(vocab)]]
        for i in range(32)
    }
    out = {}
    try:
        for n_seg in (None, 8, 16, 32, 64):
            d = tempfile.mkdtemp(prefix=f"glug_seg_{n_seg}_")
            try:
                spark.sparkContext.setJobDescription(f"build n_seg={n_seg}")
                t0 = time.perf_counter()
                summary = build_index(spark, sf_dir, d, n_buckets=16,
                                      n_segments=n_seg)
                build_sec = round(time.perf_counter() - t0, 2)
                s = Searcher(spark, d, n_buckets=16, persist=True)
                qs = {
                    "wand_single": lambda: s.topk(["data"], k=10),
                    "wand_or": lambda: s.topk(["table", "scan", "merge"],
                                              k=100),
                    "phrase": lambda: s.phrase_docs(["table", "scan"]),
                    "composed": lambda: s.search('dat* -noise "table scan"',
                                                 k=10),
                }
                for fn in qs.values():
                    fn().collect()  # warm
                timings = {}
                for name, fn in qs.items():
                    spark.sparkContext.setJobDescription(
                        f"{name} n_seg={n_seg}")
                    timings[name] = _time(lambda: fn().collect())
                s.topk_many({"warm": ["data"]}, k=10).collect()
                spark.sparkContext.setJobDescription(f"batch32 n_seg={n_seg}")
                timings["batch32"] = _time(
                    lambda: s.topk_many(batch, k=10).collect(), repeats=2)
                s.close()
                out[str(n_seg)] = {
                    "segments": summary["segments"],
                    "build_sec": build_sec,
                    **timings,
                }
                print(json.dumps({str(n_seg): out[str(n_seg)]}),
                      file=sys.stderr)
            finally:
                shutil.rmtree(d, ignore_errors=True)
    finally:
        spark.stop()
    return out




def fuzzy_profile(n_docs: int = 100_000):
    """Stage-by-stage timing of the fuzzy-curation path on the cached
    2M corpus's first n_docs (noop sinks, guide §1.4)."""
    from pyspark.sql import functions as F

    from glug_spark.session import get_spark
    from glug_spark.operators import dedup

    spark = get_spark("glug_fuzzy_prof", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 2**20))
    corpus = f"/tmp/glug_bench_corpus_2000000"
    out = {}
    try:
        docs = (
            spark.read.parquet(f"{corpus}/documents.parquet")
            .where(F.col("doc_id") < n_docs)
        )
        stages = {
            "signatures": lambda: noop(dedup.minhash_signatures(docs)),
            "bands": lambda: noop(dedup.minhash_bands(docs)),
            "cand_pairs": lambda: noop(dedup.dup_pairs_minhash(docs)),
            "verified_pairs": lambda: noop(dedup.dup_pairs_verified(docs, 0.5)),
            "clusters": lambda: noop(
                dedup.dup_clusters(dedup.dup_pairs_verified(docs, 0.5))
            ),
            "apply_fuzzy": lambda: noop(
                dedup.dedup_apply_fuzzy(docs, verify_threshold=0.5)
            ),
        }
        for name, fn in stages.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            out[name] = round(time.perf_counter() - t0, 2)
            print(json.dumps({name: out[name]}), file=sys.stderr)
    finally:
        spark.stop()
    return out


def exact_profile():
    """Stage timing of exact curation on the full 2M corpus."""
    from pyspark.sql import functions as F

    from glug_spark.session import get_spark
    from glug_spark.operators import dedup, textstats
    from glug_spark.operators.curation import curate

    spark = get_spark("glug_exact_prof", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 2**20))
    corpus = "/tmp/glug_bench_corpus_2000000"
    out = {}
    try:
        docs = spark.read.parquet(f"{corpus}/documents.parquet")
        stages = {
            "scan_only": lambda: noop(docs.select("doc_id", "text")),
            "exact_groups": lambda: noop(dedup.exact_groups(docs)),
            "text_quality": lambda: noop(textstats.text_quality(docs)),
            "curate": lambda: out.__setitem__(
                "curate_count", curate(docs, 0.3, ["en"]).count()),
        }
        for name, fn in stages.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            out[name] = round(time.perf_counter() - t0, 2)
            print(json.dumps({name: out[name]}), file=sys.stderr)
    finally:
        spark.stop()
    return out


def dump_plans(sf_dir: str, out_dir: str, suffix: str):
    """Write .explain("formatted") for every headline query to
    plans/r06/<query>_<suffix>.txt (judge deliverable)."""
    import contextlib
    import io

    from glug_spark.session import get_spark
    from glug_spark.index.pipeline import build_index
    from glug_spark.query.searcher import Searcher
    from glug_spark.operators import dedup, textstats
    import __spark_entry__ as entrymod

    spark = get_spark("glug_plans", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 2**20))
    os.makedirs(out_dir, exist_ok=True)
    d = tempfile.mkdtemp(prefix="glug_plans_idx_")
    try:
        build_index(spark, sf_dir, d, n_buckets=16)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        s = Searcher(spark, d, n_buckets=16, persist=True)
        vocab = ["data", "join", "scan", "table", "merge", "index",
                 "sort", "row", "key", "hash", "the", "a", "fast",
                 "order", "window", "spark"]
        batch = {
            f"q{i}": [vocab[i % len(vocab)], vocab[(i * 7 + 3) % len(vocab)]]
            for i in range(32)
        }
        dfs = {
            "wand_single": s.topk(["data"], k=10),
            "wand_or": s.topk(["table", "scan", "merge"], k=100),
            "wand_glob": s.glob_topk("dat*", k=10),
            "phrase_indexed": s.phrase_docs(["table", "scan"]),
            "search_composed": s.search('dat* -noise "table scan"', k=10),
            "topk_many_batch32": s.topk_many(batch, k=10),
            "simhash": dedup.simhash(docs),
            "selectfilter": entrymod.queries()["selectfilter"](spark, sf_dir),
            "top_terms": textstats.top_terms(docs),
        }
        try:
            from glug_spark.operators.curation import curate

            dfs["curate_exact"] = curate(docs, 0.3, ["en"])
        except Exception:
            pass
        for name, df in dfs.items():
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"),
                      "w", encoding="utf-8") as f:
                f.write(buf.getvalue())
        s.close()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return sorted(os.listdir(out_dir))


def main():
    args = sys.argv[1:]
    if args[:1] == ["--segments"]:
        print(json.dumps(seg_sweep(args[1] if len(args) > 1 else SF_DIR)))
    elif args[:1] == ["--fuzzy-profile"]:
        print(json.dumps(fuzzy_profile()))
    elif args[:1] == ["--exact-profile"]:
        print(json.dumps(exact_profile()))
    elif args[:1] == ["--plans"]:
        # --plans <out_dir> <suffix> [sf_dir]
        print(json.dumps(dump_plans(
            args[3] if len(args) > 3 else "/root/testdata/sf0.1",
            args[1], args[2])))
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
