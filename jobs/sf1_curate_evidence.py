#!/usr/bin/env python
"""Round-5 scale evidence for the shuffle-heavy DEDUP family (round-4
verdict item 5): run the composed curation chain (curate_verdict: exact
dedup -> LSH band-star CC keep-one -> quality/lang filter -> stratified
sample) on the 6M-page sf1 corpus, recording

  - wall + docs/sec at local[32] (min-of-2, warm),
  - determinism across parallelism: full-verdict order-independent
    md5-xor hash at local[32] vs local[16] must be IDENTICAL (band-star
    CC, window winners and hash sampling are all partitioning-invariant),
  - peak JVM RSS (no driver pathology: CC runs on the edge graph only),
  - a 1 -> 4 core scaling pass on a 600k-doc slice (the co-tenant-robust
    gate shape from bench.py, one pass: lo and hi back to back).

Usage: python jobs/sf1_curate_evidence.py [n_docs] (default 6_000_000)
Prints one JSON line; paste the row into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def curate_leg(master: str, shuf: int, pages_path: str, runs: int,
               with_hash: bool) -> dict:
    """One fresh-subprocess curation leg (subprocess isolation: stopped
    sessions degrade later in-process sessions — bench.py finding)."""
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from fastie_spark.session import get_spark
from fastie_spark.textops import curate_verdict, release_caches
spark = get_spark(master={master!r}, app_name="curate_sf1",
                  shuffle_partitions={shuf})
pg = spark.read.parquet({pages_path!r})
docs = pg.select(F.xxhash64("url").alias("doc_id"),
                 F.substring_index(F.substring_index("url", "/", 3), "//", -1)
                 .alias("source"),
                 "lang", "text")
walls, kept, n = [], 0, 0
h = None
for run in range({runs}):
    t0 = time.time()
    v = curate_verdict(docs)
    agg = v.agg(F.count("*").alias("n"),
                F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
    walls.append(round(time.time() - t0, 3))
    n, kept = agg["n"], agg["kept"]
    if {with_hash!r} and run == {runs} - 1:
        row = v.select(F.md5(F.concat_ws("|",
            F.col("doc_id").cast("string"), "source", "lang", "pred_lang",
            F.col("quality").cast("string"),
            F.col("n_chars_obs").cast("string"),
            F.col("cluster_id").cast("string"),
            F.col("is_exact_winner").cast("string"),
            F.col("is_canonical").cast("string"),
            F.col("keep").cast("string"),
            F.col("in_sample").cast("string"))).alias("h")) \\
            .agg(F.bit_xor(F.xxhash64("h")).alias("x"),
                 F.count("*").alias("n")).collect()[0]
        h = [str(row["x"]), int(row["n"])]
    release_caches()
print(json.dumps({{"walls": walls, "n_docs": int(n), "n_kept": int(kept),
                   "hash": h}}))
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    pages_path = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        f"bench_pages_{n_docs}.parquet",
    )
    if not os.path.exists(pages_path):
        from bench import synth_pages
        from fastie_spark.session import get_spark

        spark = get_spark(master="local[32]", app_name="sf1_synth",
                          shuffle_partitions=32)
        synth_pages(spark, n_docs, pages_path)
        spark.stop()

    leg32 = curate_leg("local[32]", 32, pages_path, runs=2, with_hash=True)
    leg16 = curate_leg("local[16]", 16, pages_path, runs=1, with_hash=True)
    w32 = min(leg32["walls"])

    # 1 -> 4 scaling pass on a 600k slice (the gate shape; full 6M at
    # local[1] would be ~1.5h of pure single-core wall for no extra signal)
    gate_docs = 600_000
    gate_path = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
        f"bench_pages_{gate_docs}.parquet",
    )
    gate = None
    if os.path.exists(gate_path) and n_docs > gate_docs:
        lo = curate_leg("local[1]", 1, gate_path, runs=2, with_hash=False)
        hi = curate_leg("local[4]", 4, gate_path, runs=2, with_hash=False)
        lo_w, hi_w = min(lo["walls"]), min(hi["walls"])
        gate = {
            "gate_docs": gate_docs,
            "local1_walls": lo["walls"], "local4_walls": hi["walls"],
            "local1_docs_per_sec": round(gate_docs / lo_w, 1),
            "local4_docs_per_sec": round(gate_docs / hi_w, 1),
            "efficiency_1_to_4": round(lo_w / hi_w / 4, 3),
        }

    print(json.dumps({
        "metric": "curate_sf1_docs_per_sec",
        "value": round(n_docs / w32, 1),
        "unit": "docs/sec",
        "n_docs": n_docs,
        "n_kept": leg32["n_kept"],
        "local32_walls": leg32["walls"],
        "local16_walls": leg16["walls"],
        "hash_local32": leg32["hash"],
        "hash_local16": leg16["hash"],
        "bit_identical": leg32["hash"] == leg16["hash"],
        "scaling_pass": gate,
    }))


if __name__ == "__main__":
    main()
