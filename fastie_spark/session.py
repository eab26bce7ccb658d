"""SparkSession factory with the engine's standard configs.

Tuned for correctness-at-scale defaults: AQE on (runtime coalesce + skew
join), Arrow transfer for the pandas-UDF stages, UTC session timezone so
DuckDB oracle comparisons are stable, shuffle partitions sized to cores
(overridable for the real cluster).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "fastie_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Create a DataFrame from driver-local rows via pandas/Arrow.

    The plain list path pickles rows into defaultParallelism Python slices,
    and every downstream materialization (e.g. each broadcast-hash-join
    build) pays a Python-worker round-trip per slice — measured ~4x slower
    than the Arrow path for dictionary-sized tables. Always use this for
    linker dictionaries, alias edges, component maps, fixtures."""
    pdf = rows if isinstance(rows, pd.DataFrame) else pd.DataFrame(list(rows))
    return spark.createDataFrame(pdf, schema)
