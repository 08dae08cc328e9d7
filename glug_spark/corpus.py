"""Corpus loading + deterministic webtext shaping.

The engine's canonical input is a Common-Crawl-style table
``(url string, warc_ts timestamp, html binary, text string, lang string)``
(the BASELINE input hint). The sandbox testdata ships ``documents``
as ``(doc_id, text, lang, source, n_chars)``; :func:`webtext` derives the
canonical shape from it with pure column expressions — deterministically,
so the DuckDB oracle can derive the *identical* table via
:data:`WEBTEXT_SQL` and every downstream query stays hash-comparable.

At 100 TB the same derivation is a metadata-only projection over the raw
scan: no shuffle, no UDF, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: File extensions cycled by doc_id so path-filter/typetag queries have
#: realistic variety. CASE-expression (not array-index) for SQL parity.
EXTENSIONS = ["html", "cpp", "hpp", "py", "md", "txt"]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from glug_spark.sources.tables import read_table

    return read_table(spark, f"{sf_dir}/{table}.parquet")


def _ext_expr(doc_id_col: str) -> str:
    branches = " ".join(
        f"WHEN {i} THEN '{ext}'" for i, ext in enumerate(EXTENSIONS)
    )
    return f"CASE {doc_id_col} % {len(EXTENSIONS)} {branches} END"


def url_sql(doc_id_col: str = "doc_id", lang_col: str = "lang",
            source_col: str = "source") -> str:
    """SQL expression for the deterministic url — valid in BOTH Spark SQL
    and DuckDB (string || concat, CASE, %)."""
    return (
        f"'https://host' || CAST({doc_id_col} % 97 AS STRING) || '.example/' "
        f"|| {lang_col} || '/' || {source_col} || '/doc' "
        f"|| CAST({doc_id_col} AS STRING) || '.' || ({_ext_expr(doc_id_col)})"
    )


def path_sql(doc_id_col: str = "doc_id", lang_col: str = "lang",
             source_col: str = "source") -> str:
    """Site-relative document path (no scheme/host) — the string the
    glug-style path filters run on. Root anchor is ``site``. Valid in
    both Spark SQL and DuckDB."""
    return (
        f"'site/' || {lang_col} || '/' || {source_col} || '/doc' "
        f"|| CAST({doc_id_col} AS STRING) || '.' || ({_ext_expr(doc_id_col)})"
    )


#: DuckDB CTE body deriving the canonical webtext shape from `documents`.
#: warc_ts is exposed as epoch seconds (BIGINT) to keep timestamp
#: semantics out of cross-engine hash comparison.
WEBTEXT_SQL = f"""
SELECT
    {url_sql()} AS url,
    1735689600 + doc_id AS warc_epoch,
    '<html><head><title>' || ({url_sql()}) || '</title></head><body><pre>'
        || text || '</pre></body></html>' AS page,
    text,
    lang,
    doc_id
FROM documents
"""


def webtext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical corpus: (url, warc_ts, html binary, text, lang, doc_id).

    ``doc_id`` is retained as the stable document identity (already
    unique in the source table; for externally-sourced corpora use
    ``xxhash64(url)`` — see index.build.with_doc_id).
    """
    docs = load(spark, sf_dir, "documents")
    url = F.expr(url_sql())
    return docs.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("doc_id")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>"), url,
                F.lit("</title></head><body><pre>"), F.col("text"),
                F.lit("</pre></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )
