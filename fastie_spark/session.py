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


def _cores_of(master: str) -> int:
    """Best-effort core count from a master string: local[N], local[*],
    local-cluster[workers,coresPerWorker,mem]."""
    if "[" not in master:
        return 32
    body = master[master.find("[") + 1 : master.find("]")]
    parts = body.split(",")
    if len(parts) >= 2 and all(p.strip().isdigit() for p in parts[:2]):
        return int(parts[0]) * int(parts[1])  # local-cluster
    return 32 if parts[0] == "*" else max(8, int(parts[0]))


def get_spark(
    master: str | None = None,
    app_name: str = "fastie_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # None + no env = respect an externally provided master (spark-submit
    # --master). Only fall back to local[cpus] when nothing is configured.
    explicit = master or os.environ.get("SPARK_GRAFT_MASTER")
    master = explicit or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = _cores_of(master)
    b = (
        SparkSession.builder
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
    if explicit:
        b = b.master(master)
    else:
        # no explicit master: let spark-submit's --master win if present
        try:
            spark = b.getOrCreate()
            spark.sparkContext.setLogLevel("WARN")
            return spark
        except Exception:
            b = b.master(master)
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
