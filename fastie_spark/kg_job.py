"""End-to-end KG construction job: extract -> link -> canonicalize -> materialize.

This is the north_rule pipeline in one callable, used by bench.py (the
triples/sec metric times exactly this) and by tests. All stages are the
DataFrame compositions defined in the sibling modules; the only Python-side
loops are the CC iteration (driver-side, O(log n) rounds) and the decode
logic inside the fused Arrow UDF.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cc import canonicalize, connected_components
from .linking import link_mentions, link_triples
from .materialize import build_graph_tables, materialize_snapshot
from .pipeline import run_extraction_fused
from .scorer import Vocab


def run_kg_job(
    spark: SparkSession,
    pages: DataFrame,
    vocab: Vocab,
    linker: DataFrame,
    alias_edges: DataFrame,
    out_dir: str | None = None,
    snapshot_id: str = "snap-000",
    num_partitions: int | None = None,
    n_buckets: int = 8,
    repartition: bool = True,
) -> dict:
    """Returns dict with stage DataFrames and summary counts/timings."""
    from pyspark.sql import Observation

    t0 = time.time()

    stages = run_extraction_fused(
        spark, pages, vocab, num_partitions=num_partitions, from_html=True,
        repartition=repartition,
    )
    # per-kind counts ride along with the FIRST action that scans the raw
    # extraction output (observe = CollectMetrics; filters are not pushed
    # below it) instead of paying a dedicated groupBy job + cache scan
    obs = Observation("kind_counts")
    raw = stages["_raw"].observe(
        obs,
        F.sum((F.col("kind") == "mention").cast("long")).alias("mention"),
        F.sum((F.col("kind") == "triple").cast("long")).alias("triple"),
        F.sum((F.col("kind") == "event").cast("long")).alias("event"),
    )
    from .pipeline import EVENT_COLS, MENTION_COLS, TRIPLE_COLS

    mentions_raw = raw.filter(F.col("kind") == "mention").select(*MENTION_COLS)
    triples_raw = raw.filter(F.col("kind") == "triple").select(*TRIPLE_COLS)
    events_raw = raw.filter(F.col("kind") == "event").select(*EVENT_COLS)

    # stage 3: entity linking. The job's dictionary is caller-supplied and
    # fixture-sized, so pin "broadcast" (no probe job in the hot path); the
    # linking API itself defaults to "auto" and falls back to a shuffled
    # AQE-skew-handled join for non-broadcastable dictionaries.
    triples_linked = link_triples(triples_raw, linker, strategy="broadcast")
    mentions_linked = link_mentions(mentions_raw, linker, strategy="broadcast")

    # stage 4: canonicalization (union-find over alias edges)
    components = connected_components(alias_edges)
    triples_linked = canonicalize(triples_linked, components, "subj_id", "subj_comp")
    triples_linked = canonicalize(triples_linked, components, "obj_id", "obj_comp")
    mentions_linked = canonicalize(
        mentions_linked, components, "entity_id", "entity_comp"
    )

    result = {
        "mentions": mentions_linked,
        "triples": triples_linked,
        "events": events_raw,
    }

    if out_dir is not None:
        # ONE full-pipeline action (the provenance write, which also fills
        # the raw persist and carries the per-bucket lineage counts as
        # CollectMetrics). nodes AND edges then both derive from the now-hot
        # cache (a cache scan is ~40x cheaper than the pipeline, measured),
        # and their two writes are independent jobs — submitted from a small
        # thread pool so the second write's tasks back-fill executors freed
        # by the first's tail instead of waiting for it (guide-style
        # overlap of independent jobs).
        manifest = materialize_snapshot(
            triples_linked, out_dir, snapshot_id, n_buckets=n_buckets
        )
        graph = build_graph_tables(triples_linked, mentions_linked)

        def _write(pair):
            # no coalesce: it capped the FINAL aggregation stage (not just
            # the file write) at 8 tasks; AQE's partition coalescing
            # already right-sizes the post-shuffle partition count for
            # these small tables, so the plain write keeps the agg at full
            # parallelism and still emits few files (measured: nodes write
            # 1.15s plain vs 3.5s coalesced on the 600k-doc bench)
            name, df = pair
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}")

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            list(pool.map(_write, [("nodes", graph["nodes"]),
                                   ("edges", graph["edges"])]))
        result["manifest"] = manifest
        # per-bucket lineage counts already paid for the pass — reuse
        result["n_triples"] = sum(
            b["triples"] for b in manifest["buckets"].values()
        )
    else:
        triples_linked = triples_linked.persist()
        result["triples"] = triples_linked
        graph = build_graph_tables(triples_linked, mentions_linked)
        result["n_triples"] = triples_linked.count()
    result["nodes"] = graph["nodes"]
    result["edges"] = graph["edges"]

    # the write/count action above already flowed every raw row through the
    # observe node — obs.get is a metadata fetch, not another job
    result["counts"] = {
        k: int(v) for k, v in obs.get.items() if v and int(v) > 0
    }
    result["wall_sec"] = time.time() - t0
    stages["_raw"].unpersist()
    return result
