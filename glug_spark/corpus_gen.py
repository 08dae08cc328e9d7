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
