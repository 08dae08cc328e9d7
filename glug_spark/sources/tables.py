"""Table IO: Iceberg catalog tables first, parquet directories as the
sandbox fallback.

The engine's canonical corpus is an Iceberg table of Common-Crawl-style
web pages ``(url, warc_ts, html, text, lang)`` (BASELINE input hint).
On a production cluster the Iceberg runtime provides snapshot-isolated
reads, partition pruning on (bucketed url, lang) and metadata-only
planning for the 10^12-doc build's resume scans. This sandbox ships no
Iceberg jars, so every reader goes through :func:`read_table`, which
resolves, in order:

1. ``catalog.db.table`` identifiers via ``spark.read.format("iceberg")``
   (works when the Iceberg runtime + catalog are configured),
2. a directory path via ``spark.read.parquet``.

Writers mirror the same rule. Nothing downstream knows which engine
materialized the DataFrame — the physical source only changes the scan
node, never the plan above it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:  # noqa: BLE001 - any JVM lookup failure = absent
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """Read an Iceberg table identifier or a parquet directory/file.

    A ``location`` that exists on the filesystem (or ends in .parquet)
    is parquet; otherwise it is treated as an Iceberg identifier and
    requires the runtime.
    """
    if os.path.exists(location) or location.endswith(".parquet"):
        return spark.read.parquet(location)
    if _iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    raise ValueError(
        f"{location!r} is not a parquet path and no Iceberg runtime is "
        "on the classpath"
    )


def write_table(
    df: DataFrame,
    location: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write to an Iceberg identifier (if runtime present and the
    location is not a filesystem path) or a parquet directory."""
    spark = df.sparkSession
    is_path = os.path.isabs(location) or location.endswith(".parquet")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if not is_path and _iceberg_available(spark):
        w.format("iceberg").saveAsTable(location)
    else:
        w.parquet(location)
