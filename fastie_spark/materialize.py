"""Graph materialization + snapshot checkpoint/lineage (north_rule stages 4-5).

Produces three tables (parquet, hash-bucketed by url / canonical id — the
sandbox stand-in for an Iceberg ``bucket(...)`` partition spec; the write
path is isolated here so a real Iceberg catalog is a one-function swap):

  nodes(component, entity_type, n_mentions, surfaces)
  edges(subj_id, pred, obj_id, n_support)
  provenance(url, subj, pred, obj, subj_id, obj_id, bucket, snapshot_id,
             partition_id)   -- per-row lineage: which snapshot + which
             Spark partition produced each triple

Checkpoint/resume model: work is partitioned into ``n_buckets`` url-hash
buckets. A JSON manifest per snapshot records, per completed bucket, the
row counts (per-partition lineage metrics). ``run`` skips buckets already
in the manifest and appends only missing ones — crash-resume is idempotent
(asserted by tests/test_resume.py). The manifest write is atomic
(tmp + rename), so a crash mid-write never corrupts the watermark.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_COL = "bucket"


def with_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn(BUCKET_COL, F.pmod(F.xxhash64(key), F.lit(n_buckets)))


def manifest_path(out_dir: str, snapshot_id: str) -> str:
    return os.path.join(out_dir, f"_manifest_{snapshot_id}.json")


def read_manifest(out_dir: str, snapshot_id: str) -> dict:
    p = manifest_path(out_dir, snapshot_id)
    if not os.path.exists(p):
        return {"snapshot_id": snapshot_id, "buckets": {}}
    with open(p) as f:
        return json.load(f)


def write_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    p = manifest_path(out_dir, manifest["snapshot_id"])
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, p)  # atomic watermark update


def build_graph_tables(triples_linked: DataFrame, mentions_linked: DataFrame,
                       skew_safe: bool = False) -> dict:
    """Aggregate canonicalized triples/mentions into nodes + edges.

    skew_safe: route the surfaces collect_set through the two-stage salted
    aggregation (skew.salted_collect_set) — for Zipf-heavy corpora where a
    head entity's surface set would otherwise concentrate in one task's
    aggregation buffer. Off by default (one shuffle beats two below that
    regime; AQE handles the rest)."""
    base = mentions_linked.filter(F.col("entity_comp").isNotNull())
    if skew_safe:
        from .skew import salted_collect_set

        stats = base.groupBy(F.col("entity_comp").alias("component")).agg(
            F.count("*").alias("n_mentions"),
            F.min("label").alias("entity_type"),
        )
        surf = salted_collect_set(
            base.select(F.col("entity_comp").alias("component"), "surface",
                        "url"),
            "component", "surface", unique_col="url", max_items=8,
        ).withColumnRenamed("surface_set", "surfaces")
        nodes = stats.join(surf, "component")
    else:
        nodes = base.groupBy(F.col("entity_comp").alias("component")).agg(
            F.count("*").alias("n_mentions"),
            F.slice(F.sort_array(F.collect_set("surface")), 1, 8).alias("surfaces"),
            F.min("label").alias("entity_type"),
        )
    edges = (
        triples_linked.filter(
            F.col("subj_comp").isNotNull() & F.col("obj_comp").isNotNull()
        )
        .groupBy(
            F.col("subj_comp").alias("subj_id"),
            F.col("pred"),
            F.col("obj_comp").alias("obj_id"),
        )
        .agg(F.count("*").alias("n_support"))
    )
    return {"nodes": nodes, "edges": edges}


def materialize_snapshot(
    triples_linked: DataFrame,
    out_dir: str,
    snapshot_id: str,
    n_buckets: int = 8,
    resume: bool = True,
) -> dict:
    """Write provenance table bucket-by-bucket with checkpoint/resume.

    Returns the final manifest. Buckets already recorded in the manifest are
    skipped entirely (their parquet partition dir is left untouched), so a
    resumed run reproduces exactly the same table as an uninterrupted one.
    """
    manifest = read_manifest(out_dir, snapshot_id) if resume else {
        "snapshot_id": snapshot_id, "buckets": {}
    }
    done = set(manifest["buckets"])

    prov = with_bucket(triples_linked, "url", n_buckets).withColumn(
        "snapshot_id", F.lit(snapshot_id)
    ).withColumn("partition_id", F.spark_partition_id())

    todo = [b for b in range(n_buckets) if str(b) not in done]
    if todo:
        from pyspark.sql import Observation

        spark = triples_linked.sparkSession
        pending = prov.filter(F.col(BUCKET_COL).isin(todo))
        # per-bucket lineage counts ride the write action itself as
        # CollectMetrics (one sum per pending bucket) instead of a second
        # readback job over the committed files — same numbers (the write
        # and the metrics see the same rows), one fewer job in the e2e wall
        obs = Observation(f"bucket_counts_{snapshot_id}")
        pending = pending.observe(
            obs,
            *[
                F.coalesce(
                    F.sum((F.col(BUCKET_COL) == b).cast("long")), F.lit(0)
                ).alias(f"b{b}")
                for b in todo
            ],
        )
        prov_dir = os.path.join(out_dir, "provenance")
        # dynamic partition overwrite = idempotent per-bucket commit: a crash
        # between data write and manifest update just rewrites those buckets
        # on resume instead of appending duplicates (MERGE-like semantics,
        # the parquet stand-in for an Iceberg replacePartitions commit).
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                # partitioned by (snapshot, bucket): dynamic overwrite only
                # replaces THIS snapshot's bucket dirs, so crash-replay is
                # idempotent and earlier snapshots are never clobbered; one
                # task per bucket -> one file per partition
                pending.repartition(len(todo), F.col(BUCKET_COL))
                .write.mode("overwrite")
                .partitionBy("snapshot_id", BUCKET_COL)
                .parquet(prov_dir)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # obs.get blocks on the finished write action — a metadata fetch,
        # not another job. A zero-row pending set produces NO metrics row
        # at all (the observed plan never executes a task), and obs.get
        # raises from the JVM in that case — fall back to all-zero counts,
        # matching the old readback's counts.get(b, 0) when no files exist.
        try:
            counts = obs.get
        except Exception:
            counts = {}
        for b in todo:
            manifest["buckets"][str(b)] = {
                "triples": int(counts.get(f"b{b}", 0) or 0)
            }
        write_manifest(out_dir, manifest)
    return manifest
