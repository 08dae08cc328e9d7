"""Corpus curation: the composed cleaning pass a training-data
pipeline runs before indexing — exact dedup + quality floor + language
allowlist, in one declarative plan.

Composition of the already-oracle-checked primitives
(:mod:`operators.dedup`, :mod:`operators.textstats`):

1. exact dedup keeps the min-doc_id copy per content hash,
2. the quality score (length/punct/stopword heuristics) must clear a
   floor,
3. the detected language must be in the allowlist.

Plan shape at 100 TB: one hash-agg for the keeper set (skew-free,
content-hash keyed), a semi-join back, and pure column expressions for
the quality/language predicates — no UDFs, no collects, fully
pushdown-friendly. :func:`curate` emits the audit projection the
oracle checks; :func:`curate_docs` keeps the original document columns
so `build_index` consumes it directly (curate → index is the pipeline,
runnable end-to-end via the CLI ``curate`` subcommand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from glug_spark.operators import dedup, textstats


def curate(
    docs: DataFrame,
    min_quality: float = 0.3,
    langs: list[str] | None = None,
    fuzzy: bool = False,
    verify_threshold: float | None = None,
) -> DataFrame:
    """Cleaned corpus: deduplicated + quality-floored (+ language-
    filtered when ``langs`` given). Returns the AUDIT projection of the
    survivors — ``(doc_id, quality, pred_lang)``; use
    :func:`curate_docs` when the original document columns (text etc.)
    are needed downstream.

    ``fuzzy=True`` additionally drops NEAR-duplicates: MinHash-LSH
    candidates → transitive clusters → only the min-doc_id canonical
    of each cluster survives (``dedup.dedup_apply_fuzzy``). Exact dedup
    still runs first (byte-identical copies never reach the shingle
    stage). ``verify_threshold`` (with ``fuzzy=True``) verifies each
    LSH candidate pair with exact Jaccard before clustering — the
    production configuration."""
    keep = dedup.exact_groups(docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    kept_docs = docs.join(keep, "doc_id", "left_semi")
    if fuzzy:
        kept_docs = dedup.dedup_apply_fuzzy(
            kept_docs, verify_threshold=verify_threshold
        )
    # quality + language are pure column expressions — computed INLINE
    # on the kept docs (the docstring's promised plan shape; the old
    # form joined two corpus-sized per-doc projections back on doc_id,
    # i.e. two needless corpus shuffles for derivable columns)
    out = textstats.text_quality(kept_docs).where(
        F.col("quality") >= F.lit(min_quality)
    )
    if langs:
        out = out.where(F.col("pred_lang").isin(langs))
    return out.select(
        "doc_id", F.round("quality", 6).alias("quality"), "pred_lang"
    )


def curate_sql(min_quality: float = 0.3, langs: list[str] | None = None) -> str:
    """Oracle twin — composed from the primitives' oracle SQL."""
    lang_clause = ""
    if langs:
        quoted = ", ".join(f"'{lang}'" for lang in langs)
        lang_clause = f"AND l.pred_lang IN ({quoted})"
    return f"""
WITH keep AS (
    SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
q AS ({textstats.quality_score_sql()}),
l AS ({textstats.lang_id_sql()})
SELECT d.doc_id, round(q.quality, 6) AS quality, l.pred_lang
FROM documents d
JOIN keep USING (doc_id)
JOIN q ON q.doc_id = d.doc_id
JOIN l ON l.doc_id = d.doc_id
WHERE q.quality >= {min_quality} {lang_clause}
"""


def curate_docs(
    docs: DataFrame,
    min_quality: float = 0.3,
    langs: list[str] | None = None,
    fuzzy: bool = False,
    verify_threshold: float | None = None,
) -> DataFrame:
    """The surviving documents with their ORIGINAL columns — what
    ``build_index`` consumes directly (curate → index is the pipeline;
    :func:`curate` is the audit projection the oracle checks)."""
    kept = curate(docs, min_quality, langs, fuzzy=fuzzy,
                  verify_threshold=verify_threshold).select("doc_id")
    return docs.join(kept, "doc_id", "left_semi")


def curate_fuzzy_sql(
    min_quality: float = 0.3, langs: list[str] | None = None,
    verify_threshold: float | None = None,
) -> str:
    """Differential twin for ``curate(..., fuzzy=True)``: the exact-
    dedup keeper set minus non-canonical near-dup cluster members
    (recursive-CTE closure — over Jaccard-verified pairs when
    ``verify_threshold`` is given), then the same quality/lang
    predicates."""
    lang_clause = ""
    if langs:
        quoted = ", ".join(f"'{lang}'" for lang in langs)
        lang_clause = f"AND l.pred_lang IN ({quoted})"
    return f"""
WITH keep AS (
    SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
clusters AS ({dedup.dup_clusters_sql(verify_threshold)}),
fuzzy_drop AS (
    SELECT doc_id FROM clusters WHERE doc_id <> cluster_id
),
q AS ({textstats.quality_score_sql()}),
l AS ({textstats.lang_id_sql()})
SELECT d.doc_id, round(q.quality, 6) AS quality, l.pred_lang
FROM documents d
JOIN keep USING (doc_id)
JOIN q ON q.doc_id = d.doc_id
JOIN l ON l.doc_id = d.doc_id
WHERE d.doc_id NOT IN (SELECT doc_id FROM fuzzy_drop)
  AND q.quality >= {min_quality} {lang_clause}
"""


def latest_crawl(pages: DataFrame, url_col: str = "url",
                 ts_col: str = "warc_ts") -> DataFrame:
    """Recrawl supersession: keep the NEWEST fetch per url.

    The crawl-native dedup key — a Common-Crawl-style feed re-fetches
    pages across snapshots, and every downstream stage (extract, index,
    curate) must see exactly one row per url, the freshest. Ties (equal
    ``warc_ts``, e.g. a crawler retry landing in the same second) break
    on the larger ``doc_id`` so the result is deterministic under any
    partitioning.

    Plan shape at 100 TB: one hash-partition shuffle on url (the same
    key the feed is naturally bucketed by, so with a bucketed source
    table the exchange vanishes), a per-key max — no join-back: the
    window's ``rank=1`` filter over (url) partitions is map-side after
    the exchange. Skewed hosts are one-row-per-URL, so the key space is
    ~uniform; AQE covers pathological single-url floods (a crawler
    stuck re-fetching one page).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(url_col).orderBy(
        F.col(ts_col).desc(), F.col("doc_id").desc()
    )
    return (
        pages.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
