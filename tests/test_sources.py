"""Table IO adapter: parquet paths resolve; non-path identifiers
require the Iceberg runtime (absent in this sandbox → clean error)."""

from __future__ import annotations

import pytest

from glug_spark.sources.tables import _iceberg_available, read_table
from tests.conftest import SF_DIR


def test_parquet_path_reads(spark):
    df = read_table(spark, f"{SF_DIR}/documents.parquet")
    assert df.count() > 0
    assert "text" in df.columns


def test_iceberg_identifier_requires_runtime(spark):
    if _iceberg_available(spark):
        pytest.skip("Iceberg runtime present; identifier would resolve")
    with pytest.raises(ValueError, match="Iceberg"):
        read_table(spark, "catalog.db.documents")
