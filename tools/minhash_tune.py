"""Measure MinHash-LSH candidate precision/recall per geometry.

Ground truth: the EXHAUSTIVE pair set above the Jaccard threshold —
every pair sharing >=1 shingle (complete for any threshold > 0) scored
with exact shingle-set Jaccard. Each (n_hashes, n_bands) geometry's LSH
candidates are then scored:

    recall    = |cand ∩ truth| / |truth|      (missed near-dups)
    precision = |cand ∩ truth| / |cand|       (wasted verify work)

Precision here is CANDIDATE precision — production pipelines verify
candidates with exact Jaccard anyway (``jaccard_pairs``), so recall is
the correctness-critical number and (1 - precision) is pure wasted
verification cost, not wrong output.

Usage: python tools/minhash_tune.py [sf_dir] [threshold]
Emits one JSON line per config; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

CONFIGS = [
    (8, 4),     # r=2: the old toy s-curve, midpoint (1/4)^(1/2) = 0.50
    (32, 8),    # r=4: midpoint (1/8)^(1/4)  = 0.595
    (64, 16),   # r=4: midpoint (1/16)^(1/4) = 0.50   <- default
    (128, 32),  # r=4: midpoint (1/32)^(1/4) = 0.42
    (64, 32),   # r=2: midpoint (1/32)^(1/2) = 0.177 (recall-greedy)
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from glug_spark.operators import dedup
    from glug_spark.session import get_spark

    spark = get_spark()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n_docs = docs.count()

    t0 = time.time()
    truth_df = dedup.jaccard_pairs(
        docs, threshold, cand=dedup.all_shared_shingle_pairs(docs)
    )
    truth = {(r["doc_a"], r["doc_b"]) for r in truth_df.collect()}
    t_truth = time.time() - t0
    print(json.dumps({
        "sf_dir": sf_dir, "n_docs": n_docs, "threshold": threshold,
        "true_pairs": len(truth), "truth_sec": round(t_truth, 2),
    }), flush=True)

    for n_hashes, n_bands in CONFIGS:
        t0 = time.time()
        cand = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.dup_pairs_minhash(
                docs, n_hashes=n_hashes, n_bands=n_bands
            ).collect()
        }
        dt = time.time() - t0
        hit = len(cand & truth)
        print(json.dumps({
            "n_hashes": n_hashes, "n_bands": n_bands,
            "rows_per_band": n_hashes // n_bands,
            "candidates": len(cand),
            "recall": round(hit / len(truth), 4) if truth else None,
            "precision": round(hit / len(cand), 4) if cand else None,
            "sec": round(dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
