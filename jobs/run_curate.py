#!/usr/bin/env python
"""spark-submit entrypoint for the composed corpus-curation job
(curate_verdict: exact dedup -> LSH band-star/rep-graph CC keep-one ->
quality/lang admission -> stratified sampling) — the training-data
pipeline a curation team runs before admitting a crawl to training.

Cluster usage:

    zip -r fastie_spark.zip fastie_spark
    spark-submit --py-files fastie_spark.zip jobs/run_curate.py \
        --docs s3://bucket/documents_parquet \
        --out  s3://bucket/curation

Sandbox smoke (local mode):

    python jobs/run_curate.py --pages /tmp/bench_pages_600000.parquet \
        --out /tmp/curation

Input is either --docs (a documents-shaped table: doc_id, source, lang,
text) or --pages (a Common-Crawl-style pages table: url, warc_ts, html,
text, lang — doc_id is derived as xxhash64(url), source as the url host).
Also accepts a leading config.yaml like run_kg.py. Outputs under --out:
  verdict/   one row per doc (cluster_id, is_exact_winner, is_canonical,
             keep, in_sample, quality, pred_lang, ...)
  report/    per-source admission report (counts per stage, keep rate,
             mean kept quality)
and prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    from fastie_spark.config import (
        apply_config_defaults,
        load_job_config,
        pop_config_arg,
    )

    if argv is None:
        argv = sys.argv[1:]
    config_path, argv = pop_config_arg(list(argv))
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default=None,
                    help="documents parquet (doc_id, source, lang, text)")
    ap.add_argument("--pages", default=None,
                    help="pages parquet (url, warc_ts, html, text, lang)")
    ap.add_argument("--out", default=None, help="curation output dir")
    ap.add_argument("--master", default=None)
    if config_path:
        apply_config_defaults(ap, load_job_config(config_path), config_path)
    args = ap.parse_args(argv)
    if not args.out or not (args.docs or args.pages):
        ap.error("--out and one of --docs/--pages are required "
                 "(as flags or config keys)")

    from pyspark.sql import functions as F

    from fastie_spark.session import get_spark
    from fastie_spark.textops import curate_report_df, curate_verdict

    spark = get_spark(master=args.master, app_name="curate_corpus")
    if args.docs:
        docs = spark.read.parquet(args.docs).select(
            "doc_id", "source", "lang", "text"
        )
    else:
        docs = spark.read.parquet(args.pages).select(
            F.xxhash64("url").alias("doc_id"),
            F.substring_index(F.substring_index("url", "/", 3), "//", -1)
            .alias("source"),
            "lang", "text",
        )

    t0 = time.time()
    verdict = curate_verdict(docs)
    verdict.write.mode("overwrite").parquet(os.path.join(args.out, "verdict"))
    # report over the WRITTEN verdict: re-reading the parquet is cheaper
    # than re-running the chain, and ties the report to the shipped rows
    written = spark.read.parquet(os.path.join(args.out, "verdict"))
    report = curate_report_df(written)
    report.write.mode("overwrite").parquet(os.path.join(args.out, "report"))
    wall = time.time() - t0

    agg = written.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum(F.col("in_sample").cast("long")).alias("n_sampled"),
    ).collect()[0]
    print(json.dumps({
        "n_docs": int(agg["n_docs"]),
        "n_kept": int(agg["n_kept"]),
        "n_sampled": int(agg["n_sampled"]),
        "n_sources": report.count(),
        "wall_sec": round(wall, 2),
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
