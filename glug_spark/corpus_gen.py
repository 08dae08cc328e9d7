"""Deterministic synthetic webtext corpus generator (bench scale).

Byte-stable across runs AND across parallelism levels: every document is
a pure function of (seed, doc_id) — each row seeds its own PCG64 — so
``local[8]`` and ``local[32]`` produce identical bytes, which is what
makes the two-parallelism scaling protocol a controlled experiment.

Distributional shape mirrors FIXTURES.md §1: Zipf(s≈1.07) vocabulary
with deliberate head-term skew (stopwords in most docs — exercises the
segment fan-out that replaces groupBy(term) salting), mixed-case
variants (case-sensitivity), a CRLF subset and trailing whitespace
(byte-fidelity), multiple langs/sources (partition variety).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

VOCAB_SIZE = 10_000
STOPHEAD = ["the", "a", "of", "and", "to", "in", "is", "it"]
LANGS = ["en", "de", "es", "fr", "zh"]
ZIPF_S = 1.07

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def _vocab() -> np.ndarray:
    base = [f"term{i}" for i in range(VOCAB_SIZE - len(STOPHEAD) - 20)]
    mixed = [f"Term{i}" for i in range(10)] + [f"TERM{i}" for i in range(10)]
    return np.array(STOPHEAD + mixed + base)


def _doc_text(rng: np.random.Generator, vocab: np.ndarray) -> str:
    n_tokens = int(rng.integers(30, 400))
    # Zipf ranks → vocab indices (clip the unbounded tail into the vocab)
    ranks = np.minimum(rng.zipf(ZIPF_S, size=n_tokens) - 1, len(vocab) - 1)
    words = vocab[ranks]
    text = " ".join(words.tolist())
    style = int(rng.integers(0, 10))
    if style == 0:
        text = text.replace(" ", "\r\n", 5)   # CRLF subset
    elif style == 1:
        text = text.replace(" ", " \n", 3) + "   "  # trailing whitespace
    return text


def _batches(seed: int) -> "Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    vocab = _vocab()

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                rng = np.random.default_rng((seed << 34) ^ doc_id)
                text = _doc_text(rng, vocab)
                rows.append({
                    "doc_id": doc_id,
                    "text": text,
                    "lang": LANGS[doc_id % len(LANGS)],
                    "source": f"src{doc_id % 20}",
                    "n_chars": len(text),
                })
            yield pd.DataFrame(rows)

    return gen


def generate_documents(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int = 64
) -> DataFrame:
    base = spark.range(0, n_docs, numPartitions=partitions)
    return base.mapInPandas(_batches(seed), schema=SCHEMA)


def write_corpus(
    spark: SparkSession, n_docs: int, out_dir: str, seed: int = 42
) -> str:
    """Write ``{out_dir}/documents.parquet`` (bench-compatible layout)."""
    generate_documents(spark, n_docs, seed).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    return out_dir


# --- embeddings (ANN bench scale) ---------------------------------------

EMB_DIM = 64
EMB_CLUSTERS = 32

EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])


def _emb_batches(seed: int, dim: int, n_clusters: int) -> "Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # cluster centers are a pure function of the seed (identical on
        # every executor); vectors = center + noise, one PCG per vec_id
        # → byte-stable across parallelism levels, like the documents
        crng = np.random.default_rng(seed)
        centers = crng.standard_normal((n_clusters, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        def base_vec(vec_id: int) -> tuple[np.ndarray, int]:
            rng = np.random.default_rng((seed << 34) ^ (vec_id * 2 + 1))
            # noise 0.1: intra-cluster cosine ≈ 0.6, inter ≈ 0 —
            # tight enough that IVF probe curves and near-dup
            # thresholds are meaningful, loose enough to be non-toy
            label = vec_id % n_clusters
            return centers[label] + 0.1 * rng.standard_normal(dim), label

        for pdf in it:
            rows = []
            for vec_id in pdf["id"]:
                vec_id = int(vec_id)
                if vec_id % 1000 == 999:
                    # planted near-dup: a 0.02-jittered copy of the
                    # previous vector (cosine ≈ 0.98) — gives embedding
                    # dedup a KNOWN ~n/1000 true-pair set to recall
                    src, label = base_vec(vec_id - 1)
                    rng = np.random.default_rng(
                        (seed << 34) ^ (vec_id * 2 + 1)
                    )
                    v = src + 0.02 * rng.standard_normal(dim)
                else:
                    v, label = base_vec(vec_id)
                rows.append({
                    "vec_id": vec_id,
                    "embedding": v.astype(np.float32).tolist(),
                    "label": label,
                })
            yield pd.DataFrame(rows)

    return gen


def generate_embeddings(
    spark: SparkSession, n_vecs: int, dim: int = EMB_DIM,
    n_clusters: int = EMB_CLUSTERS, seed: int = 7, partitions: int = 32,
) -> DataFrame:
    """Deterministic clustered embeddings (testdata-compatible schema:
    vec_id, embedding float[], label) — a Gaussian mixture around unit
    centers so IVF recall curves are meaningful, byte-stable across
    runs and parallelism levels (per-row PCG64)."""
    base = spark.range(0, n_vecs, numPartitions=partitions)
    return base.mapInPandas(
        _emb_batches(seed, dim, n_clusters), schema=EMB_SCHEMA
    )


def write_embeddings(
    spark: SparkSession, n_vecs: int, out_dir: str, seed: int = 7
) -> str:
    """Write ``{out_dir}/embeddings.parquet`` (bench-compatible layout)."""
    generate_embeddings(spark, n_vecs, seed=seed).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/embeddings.parquet")
    return out_dir
