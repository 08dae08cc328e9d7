"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Portability design: every hash that must agree between the Spark plan
and the DuckDB oracle is ``md5`` of a string (both engines emit identical
lowercase hex), and "min-hash" is the lexicographic MIN of seeded md5
hex strings — a valid random-permutation family keyed by seed prefix,
with zero cross-engine numeric-hash coupling.

Scale notes:
- shingling + per-seed min-aggregation is one groupBy(doc_id) with
  map-side partial min — no skew (doc_id is the key).
- LSH banding turns near-dup search from O(n²) into a self-equi-join on
  (band_id, band_key); AQE skew-join handles hot buckets (boilerplate
  pages at web scale) and the band key space grows with corpus size.
- SimHash is a Pandas UDF (Arrow-batched): bit-twiddling is not
  SQL-friendly; it stays vectorized NumPy inside the executor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from glug_spark.index.build import token_array

N_HASHES = 8
N_BANDS = 4  # 2 hashes per band
SHINGLE = 3


# --- exact dedup --------------------------------------------------------

def exact_groups(docs: DataFrame) -> DataFrame:
    """(content_hash, n_copies, keep_doc_id) — canonical = min doc_id."""
    return (
        docs.select(F.col("doc_id"), F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


EXACT_GROUPS_SQL = """
SELECT md5(text) AS content_hash,
       count(*) AS n_copies,
       min(doc_id) AS keep_doc_id
FROM documents
GROUP BY md5(text)
"""


# --- MinHash + LSH ------------------------------------------------------

def _shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) — token 3-grams via array slicing (JVM-side)."""
    a = token_array()
    shingles = F.when(
        F.size(a) >= SHINGLE,
        F.transform(
            F.sequence(F.lit(0), F.size(a) - SHINGLE),
            lambda i: F.concat_ws(
                " ",
                F.element_at(a, i + 1),
                F.element_at(a, i + 2),
                F.element_at(a, i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.explode(shingles).alias("shingle"))


_SHINGLES_SQL = f"""
SELECT doc_id,
       term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle
FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(text, '[\\p{{L}}\\p{{N}}_]+')) AS term,
           generate_subscripts(regexp_extract_all(text, '[\\p{{L}}\\p{{N}}_]+'), 1) AS pos
    FROM documents
)
WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
QUALIFY lead(term, 2) OVER w IS NOT NULL
"""


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h7) — per-seed min over md5('<seed>|<shingle>')."""
    sh = _shingles(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_key) — LSH bucket keys, 4 bands × 2 hashes."""
    sig = minhash_signatures(docs)
    bands = F.array(*[
        F.md5(F.concat_ws("|", F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")))
        for b in range(N_BANDS)
    ])
    return sig.select(
        "doc_id", F.posexplode(bands).alias("band_id", "band_key")
    )


def _minhash_sig_sql() -> str:
    mins = ", ".join(
        f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(N_HASHES)
    )
    return f"SELECT doc_id, {mins} FROM ({_SHINGLES_SQL}) GROUP BY doc_id"


def minhash_bands_sql() -> str:
    selects = [
        f"SELECT doc_id, {b} AS band_id, md5(h{2 * b} || '|' || h{2 * b + 1}) AS band_key "
        f"FROM sig"
        for b in range(N_BANDS)
    ]
    return f"WITH sig AS ({_minhash_sig_sql()}) " + " UNION ALL ".join(selects)


def dup_pairs_minhash(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs sharing any LSH band."""
    bands = minhash_bands(docs)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def dup_pairs_minhash_sql() -> str:
    return f"""
WITH bands AS ({minhash_bands_sql()})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_key = b.band_key
 AND a.doc_id < b.doc_id
"""


# --- n-gram Jaccard verify (over LSH candidates) ------------------------

def jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact shingle-set Jaccard for LSH
    candidate pairs (candidate-verify pattern: LSH recalls, Jaccard
    confirms). Jaccard over DISTINCT 3-gram shingles."""
    cand = dup_pairs_minhash(docs)
    sets_ = _shingles(docs).distinct()
    sizes = sets_.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    inter = (
        cand.join(sets_.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sets_.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("na"), F.col("doc_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("na.n") + F.col("nb.n") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_sql(threshold: float = 0.5) -> str:
    return f"""
WITH bands AS ({minhash_bands_sql()}),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
),
sets_ AS (SELECT DISTINCT doc_id, shingle FROM ({_SHINGLES_SQL})),
sizes AS (SELECT doc_id, count(*) AS n FROM sets_ GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, count(*) AS n_inter
    FROM cand c
    JOIN sets_ sa ON sa.doc_id = c.doc_a
    JOIN sets_ sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.n_inter / (na.n + nb.n - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE round(i.n_inter / (na.n + nb.n - i.n_inter), 6) >= {threshold}
"""


# --- SimHash (Pandas UDF; rows-only check — bit ops aren't oracle-SQL) --

@F.pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    import hashlib
    import re as _re

    pat = _re.compile(r"\w+", _re.UNICODE)

    def one(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in pat.findall(text or ""):
            h = int.from_bytes(
                hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits == 1, 1, -1)
        out = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
        return out - 2**64 if out >= 2**63 else out  # to signed int64

    return texts.map(one)


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash of the token multiset.

    Near-dups differ in few bits; :func:`simhash_pairs` does the
    hamming-join. Rows-only correctness check (bit manipulation is not
    portable oracle SQL).
    """
    return docs.select("doc_id", _simhash64(F.col("text")).alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  n_bands: int = 4) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the 64-bit hash into ``n_bands`` 16-bit
    bands — any pair within hamming ≤ n_bands-1 shares at least one
    exact band, so the self-join touches only same-band buckets (the
    web-scale trick from Manku et al., WWW'07); candidates are verified
    with an exact JVM popcount (bit_count), no UDF in the join path.
    """
    h = simhash(docs)
    width = 64 // n_bands
    bands = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        for b in range(n_bands)
    ])
    keyed = h.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band_id", "band_key")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)
