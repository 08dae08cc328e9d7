"""SparkSession factory tuned for the engine's workload.

Scale posture: these configs are what we'd ship to a 1000-executor
cluster (AQE on, skew-join on, partition coalescing on); the parallelism
and shuffle-partition counts are the only knobs that change with cluster
size, so they are parameters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "glug_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~1 shuffle partition per core keeps task overhead low;
        # on a real cluster this would be sized to data volume instead.
        shuffle_partitions = max(8, cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    # segment granularity of the zero-shuffle build (one segment per
    # Arrow batch); overridable so small corpora can exercise the
    # multi-segment layout from the CLI
    arrow_batch = os.environ.get("SPARK_GRAFT_ARROW_BATCH")
    if arrow_batch:
        builder = builder.config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", arrow_batch
        )
    # shuffle spill dir: prefer RAM-backed tmpfs — local-mode shuffles are
    # otherwise bottlenecked on shared disk bandwidth, which caps scaling
    # with cores (a real cluster gets NVMe/disk per executor instead)
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        local_dir = os.path.join(shm, "glug-spark-local")
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    _silence_final_rank_warning(spark)
    return spark


def _silence_final_rank_warning(spark: SparkSession) -> None:
    """The final rank step of every top-k runs a window over the ≤k
    already-merged rows — a deliberate single partition, so WindowExec's
    per-query 'No Partition Defined … cause serious performance
    degradation' warning is noise here. Raise just that logger's level
    (log4j2 Configurator); best-effort, cosmetic only."""
    try:
        jvm = spark.sparkContext._jvm  # noqa: SLF001
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass
