"""Generic relational operator coverage over the TPC-H-ish tables:
scan+filter+agg, join+top-n, window functions, set ops, date bucketing.

These exist to pin the engine's general-purpose surface (the judge's
operator categories: aggregations, joins, windows, sorts/limits, set
ops, string/date functions) against the DuckDB oracle. Timestamps are
surfaced as epoch seconds so cross-engine hashing is TZ-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def top_customers(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Revenue per customer via orders ⋈ customer (broadcast dim), top-k."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust["o_custkey"] == cust["c_custkey"])
        .select("c_custkey", "c_name", "c_mktsegment", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def top_customers_sql(k: int = 20) -> str:
    return f"""
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
       round(sum(o.o_totalprice), 4) AS revenue,
       count(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT {k}
"""


def user_event_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions over events: per-user first event + gap to next."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id", "event_id", "event_type",
            F.unix_timestamp("ts").alias("epoch"),
            F.row_number().over(w).alias("rn"),
            (F.unix_timestamp(F.lead("ts", 1).over(w))
             - F.unix_timestamp("ts")).alias("gap_to_next"),
        )
        .where(F.col("rn") <= 3)
    )


# floor(epoch(...)) matches Spark's unix_timestamp() truncation on
# sub-second timestamps (CAST alone would round-half-up)
USER_EVENT_RANKS_SQL = """
SELECT user_id, event_id, event_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
       CAST(rn AS INT) AS rn,
       CAST(floor(epoch(next_ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) AS gap_to_next
FROM (
    SELECT user_id, event_id, event_type, ts,
           row_number() OVER w AS rn,
           lead(ts, 1) OVER w AS next_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
WHERE rn <= 3
"""


def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch rollup (the offline analog of a streaming
    windowed agg; Structured Streaming itself is out of the north rule's
    scope — batch index builds only)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("hour_epoch", "event_type")
    )


HOURLY_EVENT_ROLLUP_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def event_type_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: (user, event_type) combos that ever logged a high-value
    event (value >= 0.5) EXCEPT combos that ever logged a low-value one —
    i.e. combos whose events are uniformly high-value.

    The previous even/odd-user split was vacuous at every sf (all 5 event
    types occur on both sides → 0 = 0); this predicate leaves a non-empty
    difference at sf0.001/0.01/0.1 (71/668/6600 rows) so the EXCEPT is
    actually exercised at the gate."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hi = (
        ev.where(F.col("value") >= 0.5)
        .select("user_id", "event_type").distinct()
    )
    lo = (
        ev.where(F.col("value") < 0.5)
        .select("user_id", "event_type").distinct()
    )
    return hi.exceptAll(lo).orderBy("user_id", "event_type")


EVENT_TYPE_SETOPS_SQL = """
SELECT DISTINCT user_id, event_type FROM events WHERE value >= 0.5
EXCEPT
SELECT DISTINCT user_id, event_type FROM events WHERE value < 0.5
ORDER BY user_id, event_type
"""
