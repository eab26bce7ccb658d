#!/usr/bin/env python
"""Round-4 scale-up evidence (VERDICT item 4): run the e2e KG job on a
10x bench input — 6M synthesized pages, ~10 GB raw html — at local[32],
recording wall, PEAK JVM RSS (sampled from /proc during the run), and that
the output stays bit-identical across parallelism levels (local[32] vs
local[16] full provenance md5-xor hash).

Usage:  python jobs/sf1_scale_evidence.py [n_docs]      (default 6_000_000)
Prints one JSON line; paste the row into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _jvm_rss_mb() -> int:
    """Sum RSS of every java process (driver-embedded executor JVM)."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as f:
                if f.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1]) // 1024
                        break
        except OSError:
            continue
    return total


class RssSampler(threading.Thread):
    def __init__(self, interval: float = 1.0):
        super().__init__(daemon=True)
        self.peak_mb = 0
        self._stop = threading.Event()
        self.interval = interval

    def run(self):
        while not self._stop.is_set():
            self.peak_mb = max(self.peak_mb, _jvm_rss_mb())
            self._stop.wait(self.interval)

    def stop(self):
        self._stop.set()


def one_leg(master: str, shuf: int, pages_path: str, runs: int) -> dict:
    """Fresh-subprocess leg via bench.py --kg-run, with RSS sampled from
    THIS process (the JVM is a child; /proc sees it either way)."""
    import subprocess

    sampler = RssSampler()
    sampler.start()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--kg-run", master,
         pages_path, str(shuf), str(runs)],
        capture_output=True, text=True, check=True,
    )
    sampler.stop()
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["peak_jvm_rss_mb"] = sampler.peak_mb
    return r


def provenance_hash(pages_path: str, master_label: str,
                    shuf: int) -> tuple[str, int, float, int]:
    """Run the job ONCE keeping the output, return (order-independent
    md5-xor hash over provenance rows, n_triples, wall, peak_rss_mb)."""
    from fastie_spark.fixtures import (
        build_alias_edges,
        build_linker_dict,
        build_vocab,
    )
    from fastie_spark.kg_job import run_kg_job
    from fastie_spark.session import get_spark, local_df

    spark = get_spark(master=master_label, app_name=f"sf1_{shuf}",
                      shuffle_partitions=shuf)
    vocab = build_vocab()
    linker = local_df(
        spark, build_linker_dict(vocab),
        "alias string, canonical_id string, entity_type string, prior double",
    )
    edges = local_df(spark, build_alias_edges(vocab)[0],
                     "src string, dst string")
    pages = spark.read.parquet(pages_path)
    out_dir = tempfile.mkdtemp(prefix=f"sf1_out_{shuf}_")
    sampler = RssSampler()
    sampler.start()
    t0 = time.time()
    res = run_kg_job(spark, pages, vocab, linker, edges, out_dir=out_dir,
                     snapshot_id="sf1", n_buckets=32, repartition=False)
    wall = time.time() - t0
    sampler.stop()
    # order-independent full-content hash: xor of per-row md5 halves
    import duckdb

    con = duckdb.connect()
    h = con.sql(f"""
        SELECT bit_xor(hash(md5(concat_ws('|', url, subj, pred, obj,
                coalesce(subj_comp, ''), coalesce(obj_comp, ''))))) AS h,
               count(*) AS n
        FROM read_parquet('{out_dir}/provenance/**/*.parquet')
    """).fetchone()
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)
    return str(h[0]), int(h[1]), wall, sampler.peak_mb


def main():
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
    size_gb = sum(
        os.path.getsize(os.path.join(pages_path, f))
        for f in os.listdir(pages_path) if f.endswith(".parquet")
    ) / 1e9

    # steady-state timing legs (fresh subprocesses, min-of-runs)
    leg32 = one_leg("local[32]", 32, pages_path, runs=2)
    # bit-identical check across parallelism + peak RSS while keeping output
    h32, n32, w32, rss32 = provenance_hash(pages_path, "local[32]", 32)
    h16, n16, w16, rss16 = provenance_hash(pages_path, "local[16]", 16)
    print(json.dumps({
        "n_docs": n_docs,
        "input_parquet_gb": round(size_gb, 2),
        "local32": {k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in leg32.items()},
        "hash_local32": h32, "hash_local16": h16,
        "bit_identical": h32 == h16 and n32 == n16,
        "n_provenance_rows": n32,
        "hash_run_walls_sec": [round(w32, 1), round(w16, 1)],
        "peak_jvm_rss_mb": {"local32": rss32, "local16": rss16},
    }))


if __name__ == "__main__":
    main()
