#!/usr/bin/env python
"""Extended differential fuzz of the composed query engine.

Random corpora × random composed queries (groups, globs, negated globs,
multi-phrases), compared across FOUR implementations that must agree
exactly:

  1. full-scan executor (execute.search)
  2. index path (execute.search_indexed) — uncompacted
  3. index path after compaction (mixed / fully-merged layouts)
  4. batched path (Searcher.search_many) slices

Not part of the default suite (runtime-heavy); run ad hoc:
    python tools/fuzz_search.py [n_corpora] [queries_per_corpus] [seed0]
Prints one line per divergence; exit 1 if any.
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

VOCAB = ["data", "join", "scan", "table", "merge", "index", "sort",
         "row", "key", "hash", "dup", "the"]


def random_docs(rng: random.Random, n: int):
    rows = []
    for i in range(n):
        length = rng.randint(1, 40)
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(length)),
                     "en", "web", length))
    return rows


def random_query(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 3)):
        members = rng.sample(VOCAB, rng.randint(1, 3))
        if rng.random() < 0.35:
            members[0] = members[0][: rng.randint(1, 2)] + "*"
        parts.append(",".join(members))
    for _ in range(rng.randint(0, 2)):
        neg = rng.choice(VOCAB)
        if rng.random() < 0.3:
            neg = neg[:2] + "*"
        parts.append("-" + neg)
    for _ in range(rng.randint(0, 2)):
        words = rng.sample(VOCAB, rng.randint(2, 3))
        parts.append('"' + " ".join(words) + '"')
    rng.shuffle(parts)
    return " ".join(parts)


def main() -> int:
    n_corpora = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seed0 = int(sys.argv[3]) if len(sys.argv) > 3 else 40_000

    from glug_spark.index.compact import compact_index
    from glug_spark.index.pipeline import build_index
    from glug_spark.query.execute import search, search_indexed
    from glug_spark.query.searcher import Searcher
    from glug_spark.session import get_spark

    spark = get_spark("fuzz_search")
    bad = 0
    checked = 0
    for c in range(n_corpora):
        rng = random.Random(seed0 + c)
        tmp = tempfile.mkdtemp(prefix="glug_fuzz_")
        try:
            docs = spark.createDataFrame(
                random_docs(rng, rng.randint(60, 250)),
                "doc_id long, text string, lang string, source string, "
                "n_chars long",
            )
            docs.write.parquet(f"{tmp}/corpus/documents.parquet")
            key = "spark.sql.execution.arrow.maxRecordsPerBatch"
            prev = spark.conf.get(key)
            spark.conf.set(key, str(rng.choice([16, 40, 1000])))
            try:
                build_index(spark, f"{tmp}/corpus", f"{tmp}/index",
                            n_buckets=rng.choice([2, 4, 8]))
            finally:
                spark.conf.set(key, prev)
            stored = spark.read.parquet(f"{tmp}/corpus/documents.parquet")

            queries = {}
            while len(queries) < n_queries:
                q = random_query(rng)
                try:
                    expected = [tuple(r) for r in
                                search(stored, q, k=7).collect()]
                except ValueError:
                    continue  # no positive constraint
                queries[f"q{len(queries)}"] = (q, expected)

            def check(tag, run):
                nonlocal bad, checked
                for qid, (q, expected) in queries.items():
                    checked += 1
                    got = run(q)
                    if got != expected:
                        bad += 1
                        print(f"DIVERGE corpus={c} {tag} q={q!r}\n"
                              f"  want={expected}\n  got ={got}")

            check("index", lambda q: [
                tuple(r) for r in search_indexed(
                    spark, f"{tmp}/index", q, k=7,
                    n_buckets=spark.read.parquet(
                        f"{tmp}/index/params").collect()[0]["n_buckets"],
                ).collect()])

            nb = int(spark.read.parquet(
                f"{tmp}/index/params").collect()[0]["n_buckets"])
            with Searcher(spark, f"{tmp}/index", n_buckets=nb,
                          persist=False) as s:
                res = s.search_many(
                    {qid: q for qid, (q, _) in queries.items()}, k=7
                ).collect()
            by_q: dict[str, list] = {}
            for r in res:
                by_q.setdefault(r["query_id"], []).append(
                    (r["rank"], r["doc_id"], r["score"]))
            for qid, (q, expected) in queries.items():
                checked += 1
                got = sorted(by_q.get(qid, []))
                if got != expected:
                    bad += 1
                    print(f"DIVERGE corpus={c} search_many q={q!r}\n"
                          f"  want={expected}\n  got ={got}")

            compact_index(spark, f"{tmp}/index",
                          min_run=rng.choice([8, 1000]),
                          merge_factor=rng.choice([2, 4, 1000]),
                          min_groups=rng.choice([1, 8]))
            check("compacted", lambda q: [
                tuple(r) for r in search_indexed(
                    spark, f"{tmp}/index", q, k=7, n_buckets=nb
                ).collect()])
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(f"corpus {c}: ok ({checked} checks, {bad} diverging)")
    print(f"TOTAL: {checked} checks, {bad} diverging")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
