"""Driver-style parity: every queries() entry vs its oracle_sql() on
sf0.001 (the driver runs the same comparison at sf0.01). Mirrors the
reference's differential-oracle strategy (glug vs git ls-files,
reference test/parity/test_listing.py) with DuckDB as the oracle.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERY_NAMES = sorted(entrymod.queries().keys())


def _normalize(rows, columns):
    """Sort columns by name, round floats, sort rows — order-insensitive
    multiset compare, driver-style."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck):
    # every scoreboard query has a full value-hash oracle — no
    # rows-only escape hatch (bit ops, UDF features and LSH banding are
    # all expressed in portable SQL since round 2)
    oracles = entrymod.oracle_sql()
    assert name in oracles, f"{name} has no oracle"

    sdf = entrymod.queries()[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(oracles[name])
    duck_cols = [c.lower() for c in rel.description and [d[0] for d in rel.description]]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    assert len(a) == len(b), f"row count: spark={len(a)} duck={len(b)}"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{len(mismatches)} mismatching rows; first: {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["rank", "doc_id", "score"]
    assert all(not math.isnan(r["score"]) for r in rows)
