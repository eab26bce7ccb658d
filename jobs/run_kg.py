#!/usr/bin/env python
"""spark-submit entrypoint for the end-to-end KG construction job.

Cluster usage (the north-rule invocation):

    zip -r fastie_spark.zip fastie_spark
    spark-submit --py-files fastie_spark.zip jobs/run_kg.py \
        --pages s3://bucket/pages_parquet \
        --out   s3://bucket/graph \
        --snapshot-id snap-2026-08-16 \
        --n-buckets 4096

Sandbox smoke (local mode):

    python jobs/run_kg.py --pages /tmp/bench_pages_600000.parquet \
        --out /tmp/kg_graph --snapshot-id s1 --synthesize 0

With --synthesize N > 0 the job first writes a seeded synthetic pages table
of N docs to --pages (no external data). The linker dictionary and alias
edges default to the seeded fixtures; pass --linker/--alias-edges parquet
paths for real artifacts. Resumable: rerunning with the same --out and
--snapshot-id skips completed buckets (manifest watermark).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    from fastie_spark.config import (
        apply_config_defaults,
        load_job_config,
        pop_config_arg,
    )

    if argv is None:
        argv = sys.argv[1:]
    # `python jobs/run_kg.py config.yaml [--overrides]` — the reference's
    # `fastie-cli train config.yaml` launch shape (fastie/cli.py:48-65);
    # file values are defaults, explicit flags override
    config_path, argv = pop_config_arg(list(argv))
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default=None, help="pages parquet path")
    ap.add_argument("--out", default=None, help="graph output dir")
    ap.add_argument("--snapshot-id", default="snap-000")
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--linker", default=None, help="linker dict parquet")
    ap.add_argument("--alias-edges", default=None, help="alias edges parquet")
    ap.add_argument("--synthesize", type=int, default=0,
                    help="if >0, synthesize this many seeded pages first")
    ap.add_argument("--master", default=None)
    if config_path:
        apply_config_defaults(ap, load_job_config(config_path), config_path)
    args = ap.parse_args(argv)
    if not args.pages or not args.out:
        ap.error("--pages and --out are required (as flags or config keys)")

    from fastie_spark.fixtures import (
        build_alias_edges,
        build_linker_dict,
        build_vocab,
    )
    from fastie_spark.kg_job import run_kg_job
    from fastie_spark.session import get_spark, local_df

    spark = get_spark(master=args.master, app_name="kg_construct")
    vocab = build_vocab()

    if args.synthesize > 0 and not os.path.exists(args.pages):
        def gen(batches):
            import pandas as pd

            from fastie_spark.fixtures import build_page_row

            for pdf in batches:
                yield pd.DataFrame(
                    [build_page_row(vocab, int(i)) for i in pdf["id"]]
                )

        (
            spark.range(args.synthesize)
            .repartition(spark.sparkContext.defaultParallelism)
            .mapInPandas(
                gen,
                "url string, warc_ts timestamp, html binary, text string, "
                "lang string",
            )
            .write.mode("overwrite").parquet(args.pages)
        )

    linker = (
        spark.read.parquet(args.linker) if args.linker
        else local_df(
            spark, build_linker_dict(vocab),
            "alias string, canonical_id string, entity_type string, prior double",
        )
    )
    edges = (
        spark.read.parquet(args.alias_edges) if args.alias_edges
        else local_df(spark, build_alias_edges(vocab)[0],
                      "src string, dst string")
    )

    pages = spark.read.parquet(args.pages)
    res = run_kg_job(
        spark, pages, vocab, linker, edges, out_dir=args.out,
        snapshot_id=args.snapshot_id, n_buckets=args.n_buckets,
    )
    print(json.dumps({
        "snapshot_id": args.snapshot_id,
        "counts": res["counts"],
        "n_triples": res["n_triples"],
        "wall_sec": round(res["wall_sec"], 2),
        "buckets": len(res["manifest"]["buckets"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
