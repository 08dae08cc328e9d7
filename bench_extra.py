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


def main():
    args = sys.argv[1:]
    if args[:1] == ["--segments"]:
        print(json.dumps(seg_sweep(args[1] if len(args) > 1 else SF_DIR)))
    else:
        print(__doc__)


if __name__ == "__main__":
    main()
