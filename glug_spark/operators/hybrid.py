"""Hybrid retrieval: BM25 recall stage + embedding-cosine rerank.

The standard two-stage shape of retrieval-augmented pipelines: a cheap
lexical candidate set (BM25 top-m — index-backed WAND at scale, the
full-scan scorer here for oracle comparability), then an exact vector
similarity rerank on just those m docs, blended as

    score = alpha * bm25 / max_bm25(candidates) + (1 - alpha) * cosine

Scale posture: the rerank joins m (≪ corpus) candidate rows against the
embeddings table on its key — a broadcast of the candidate set onto the
embedding scan's pushed-down ``vec_id IN`` lookup; nothing corpus-sized
moves. All double math mirrors the DuckDB oracle token-for-token
(same fold order for dots, same normalization expression).

doc_id ↔ vec_id: the synthetic corpus keys embeddings by the document
id; a production deployment would join through an explicit mapping
table the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from glug_spark.query import bm25
from glug_spark.operators.similarity import (
    _DOT_SQL,
    _NORM_SQL,
    _as_double,
    _dot,
    _norm,
)


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    m: int = 100,
    alpha: float = 0.5,
) -> DataFrame:
    """(rank, doc_id, score): BM25 top-``m`` candidates reranked by
    cosine to the ``query_vec_id`` embedding, blended by ``alpha``."""
    scored = bm25._with_collection(docs, bm25._scored_terms(docs, terms))
    per_doc = scored.groupBy("doc_id").agg(
        F.sum(bm25._contribution()).alias("raw_score")
    )
    topm = per_doc.orderBy(F.desc("raw_score"), F.asc("doc_id")).limit(m)
    mx = topm.agg(F.max("raw_score").alias("mx"))
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        _as_double("embedding").alias("qv")
    )
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    # the m-row candidate set is EXPLICITLY broadcast onto the
    # corpus-sized embedding scan (a BroadcastHashJoin with the
    # candidate side small is the only plan that scales — relying on
    # Catalyst to infer smallness through orderBy().limit(m) is not a
    # guarantee; plan-asserted by tests/test_plan_shape.py)
    blended = (
        emb.join(F.broadcast(topm), topm["doc_id"] == emb["vec_id"])
        .crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            (
                F.lit(alpha) * (F.col("raw_score") / F.col("mx"))
                + F.lit(1.0 - alpha)
                * (_dot(F.col("v"), F.col("qv"))
                   / (_norm(F.col("v")) * _norm(F.col("qv"))))
            ).alias("h"),
        )
    )
    w = Window.orderBy(F.desc("h"), F.asc("doc_id"))
    return (
        blended.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "doc_id", F.round("h", 6).alias("score"))
    )


def hybrid_topk_sql(
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    m: int = 100,
    alpha: float = 0.5,
) -> str:
    """DuckDB oracle twin of :func:`hybrid_topk` — identical candidate
    set (same BM25 arithmetic + tiebreak), identical blend expression."""
    from glug_spark.index.build import B, K1

    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    dot = _DOT_SQL.format(a="e.v", b="q.qv")
    nv = _NORM_SQL.format(a="e.v")
    nq = _NORM_SQL.format(a="q.qv")
    return f"""
WITH toks AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[\\p{{L}}\\p{{N}}_]+')) AS BIGINT) AS dl,
           unnest(regexp_extract_all(text, '[\\p{{L}}\\p{{N}}_]+')) AS term
    FROM documents
),
qtoks AS (SELECT * FROM toks WHERE term IN ({quoted})),
postings AS (
    SELECT term, doc_id, count(*) AS tf, max(dl) AS dl
    FROM qtoks GROUP BY term, doc_id
),
stats AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
coll AS (
    SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
    FROM (SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '[\\p{{L}}\\p{{N}}_]+')) AS BIGINT) AS dl
          FROM documents)
),
per_doc AS (
    SELECT p.doc_id,
           sum( ln(1.0 + (c.n_docs - s.df + 0.5) / (s.df + 0.5))
                * (p.tf * ({K1} + 1.0))
                / (p.tf + {K1} * (1.0 - {B} + {B} * p.dl / c.avgdl)) ) AS raw_score
    FROM postings p JOIN stats s USING (term) CROSS JOIN coll c
    GROUP BY p.doc_id
),
topm AS (SELECT doc_id, raw_score FROM per_doc
         ORDER BY raw_score DESC, doc_id ASC LIMIT {m}),
mx AS (SELECT max(raw_score) AS mx FROM topm),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
emb AS (SELECT vec_id, embedding AS v FROM embeddings),
blended AS (
    SELECT t.doc_id,
           {alpha!r} * (t.raw_score / mx.mx)
           + {1.0 - alpha!r} * ({dot} / ({nv} * {nq})) AS h
    FROM topm t JOIN emb e ON e.vec_id = t.doc_id
    CROSS JOIN mx CROSS JOIN q
),
topk AS (SELECT doc_id, h FROM blended ORDER BY h DESC, doc_id ASC LIMIT {k})
SELECT CAST(row_number() OVER (ORDER BY h DESC, doc_id ASC) AS INT) AS rank,
       doc_id, round(h, 6) AS score
FROM topk
"""
