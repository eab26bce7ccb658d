"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

- Headline relational/text operators run at $SPARK_GRAFT_SF_DIR (default
  /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; each timed with a noop
  sink so write cost doesn't pollute the operator time.
- The KG end-to-end job (extract -> link -> canonicalize -> materialize)
  runs on a deterministically synthesized pages table (seed fixed, size
  scaled by sf); `value` is its wall seconds and `kg_triples_per_sec` the
  BASELINE.md throughput metric.
- The N->4N gate pair (local[1] vs local[4] on a half-size input, two
  interleaved passes with a CPU calibration probe — the co-tenant-robust
  design for this VM) is measured LIVE on every run; SPARK_GRAFT_SCALING=1
  additionally sweeps local[2/4/8/16/32] (the BASELINE.md two-cluster-size
  criterion, sandbox proxy).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from fastie_spark.fixtures import (  # noqa: E402
    build_alias_edges,
    build_linker_dict,
    build_vocab,
)
from pyspark.sql import functions as F  # noqa: E402

from fastie_spark.kg_job import run_kg_job  # noqa: E402
from fastie_spark.session import get_spark, local_df  # noqa: E402
from fastie_spark.textops import (  # noqa: E402
    REGISTRY,
    curate_verdict,
    release_caches,
)

HEADLINE = [
    "chunk_explode", "dedup_exact", "token_stats", "lang_id", "quality_score",
    "doc_fingerprint", "minhash_signature", "near_dup_pairs", "knn_cosine",
    "micro_prf", "source_profile", "near_dup_clusters",
]

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def calibrate_parallel(n_workers: int = 4, iters: int = 20_000_000) -> float:
    """Wall seconds for n_workers CONCURRENT python spin processes — a
    probe with the same concurrency as the gate's local[4] leg, so
    multi-core co-tenant pressure (which a single-thread probe cannot see —
    the round-3 0.76-on-a-'quiet'-probe failure) shows up directly."""
    from multiprocessing import Pool

    t0 = time.time()
    with Pool(n_workers) as p:
        p.map(_spin, [iters] * n_workers)
    return round(time.time() - t0, 3)


def synth_pages(spark, n_docs: int, path: str):
    """Distributed deterministic synthesis: one row per index via
    build_page_row (seeded per doc), generated inside a mapInPandas stage so
    100k+ pages don't bottleneck on the driver."""
    if os.path.exists(path):
        return
    vocab = build_vocab()

    def gen(batches):
        import pandas as pd

        from fastie_spark.fixtures import build_page_row

        for pdf in batches:
            yield pd.DataFrame(
                [build_page_row(vocab, int(i)) for i in pdf["id"]]
            )

    (
        spark.range(n_docs).repartition(32)
        .mapInPandas(gen, PAGES_SCHEMA)
        .write.mode("overwrite").parquet(path)
    )


def kg_run(master: str, pages_path: str, shuffle_partitions: int,
           runs: int = 3) -> dict:
    """Cold + warm (steady-state) timing of the e2e KG job. The warm run is
    the throughput/scaling number: it excludes one-time session costs
    (python-worker imports, codegen compile, parquet footer cache) that a
    long-running 100 TB job amortizes to zero."""
    spark = get_spark(master=master, app_name=f"kg_bench_{master}",
                      shuffle_partitions=shuffle_partitions)
    vocab = build_vocab()
    linker = local_df(
        spark, build_linker_dict(vocab),
        "alias string, canonical_id string, entity_type string, prior double",
    )
    er, _ = build_alias_edges(vocab)
    edges = local_df(spark, er, "src string, dst string")
    pages = spark.read.parquet(pages_path)
    walls, n = [], 0
    # min-of-3 walls: run 1 pays python-worker imports + codegen, run 2
    # still pays first-touch JVM costs (parquet footers, broadcast relation
    # build); run 3 is the steady state a long-lived job amortizes to.
    # Co-tenant noise only ever SLOWS a run, so min-of-k converges to the
    # true steady state from above — more runs make the scaling ratio both
    # more stable and more honest.
    for _ in range(runs):
        out_dir = tempfile.mkdtemp(prefix="kg_bench_")
        t0 = time.time()
        # repartition=False: the synthesized pages parquet is already 32
        # uniform url-bucketed splits (the well-bucketed-Iceberg-source
        # case), so the explicit url-hash shuffle of ~1 GB raw html is pure
        # cost here (measured 24.7s -> 19.9s at local[16]). The shuffle
        # path stays plan-gated in tests for skewed sources.
        res = run_kg_job(spark, pages, vocab, linker, edges, out_dir=out_dir,
                         snapshot_id="bench", n_buckets=32,
                         repartition=False)
        walls.append(time.time() - t0)
        n = res["n_triples"]
        for df in (res["mentions"], res["triples"], res["events"]):
            try:
                df.unpersist()
            except Exception:
                pass
        shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    # min over runs = least-noise steady-state estimator (this VM has noisy
    # co-tenants; a single polluted window must not define the round's number)
    wall = min(walls)
    return {"wall_sec": wall, "cold_wall_sec": walls[0], "n_triples": n,
            "triples_per_sec": n / wall if wall else 0.0}


def kg_run_subprocess(master: str, pages_path: str, shuf: int,
                      runs: int = 3) -> dict:
    """Each KG run in a fresh process: stopped sessions leave python daemon
    workers and JVM state behind that measurably degrade later sessions in
    the same process — subprocess isolation keeps the scaling comparison
    honest."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--kg-run", master,
         pages_path, str(shuf), str(runs)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--kg-run":
        runs = int(sys.argv[5]) if len(sys.argv) > 5 else 3
        print(json.dumps(kg_run(sys.argv[2], sys.argv[3], int(sys.argv[4]),
                                runs=runs)))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", str(int(6000000 * sf))))

    pages_path = os.path.join(
        os.environ.get("SPARK_GRAFT_TMP", "/tmp"), f"bench_pages_{n_docs}.parquet"
    )

    spark = get_spark(master=f"local[{cpus}]", app_name="bench",
                      shuffle_partitions=cpus)
    synth_pages(spark, n_docs, pages_path)

    # Per-query walls are MIN-OF-K single-query runs (default 3): this VM's
    # co-tenant noise can double a single wall (round-4: near_dup_pairs
    # read 2.38 -> 4.09 s on byte-identical code), and noise only ever
    # SLOWS a run, so min-of-k converges to the true operator cost from
    # above; the spread is carried alongside so a real regression (all k
    # runs slow) is distinguishable from one polluted window.
    q_runs = int(os.environ.get("SPARK_GRAFT_QUERY_RUNS", "3"))
    qtimes, qspread = {}, {}
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        walls = []
        for _ in range(q_runs):
            df = fn(spark, sf_dir)
            t0 = time.time()
            _noop(df)
            walls.append(round(time.time() - t0, 3))
            release_caches()  # drop operator-persisted intermediates
        qtimes[name] = min(walls)
        qspread[name] = walls

    # Composed curation chain (exact dedup -> LSH band-star CC keep-one ->
    # quality/lang filter -> stratified sample) end-to-end over the SAME
    # synthesized corpus the KG job runs on — the training-data-pipeline
    # headline beside kg_triples_per_sec. min-of-2: run 1 pays the
    # signature-cache build + CC warmup, run 2 is the steady state.
    pages = spark.read.parquet(pages_path)
    cur_docs = pages.select(
        F.xxhash64("url").alias("doc_id"),
        F.substring_index(F.substring_index("url", "/", 3), "//", -1)
        .alias("source"),
        "lang", "text",
    )
    cur_walls, cur_kept = [], 0
    for _ in range(2):
        t0 = time.time()
        v = curate_verdict(cur_docs)
        row = v.agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
        ).collect()[0]
        cur_walls.append(round(time.time() - t0, 3))
        release_caches()
        cur_kept = row["kept"]
    qtimes["curate_corpus_e2e"] = min(cur_walls)
    spark.stop()

    # KG end-to-end at the main parallelism (fresh subprocess)
    main_run = kg_run_subprocess(f"local[{cpus}]", pages_path, cpus)
    qtimes["kg_end_to_end"] = round(main_run["wall_sec"], 3)

    result = {
        "metric": "kg_e2e_wall_sec",
        "value": round(main_run["wall_sec"], 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "kg_docs": n_docs,
        "kg_triples": main_run["n_triples"],
        "kg_triples_per_sec": round(main_run["triples_per_sec"], 1),
        "query_walls_all_runs": qspread,
        "curate_docs": n_docs,
        "curate_docs_kept": int(cur_kept),
        "curate_wall_sec": min(cur_walls),
        "curate_docs_per_sec": round(n_docs / min(cur_walls), 1),
    }

    # LIVE N -> 4N gate pair: local[1] vs local[4] on a half-size input
    # (smaller inputs over-weight the fixed per-run tail: at quarter size a
    # QUIET box measures 0.795 purely from the tail share),
    # THREE INTERLEAVED PASSES (lo, hi, lo, hi, lo, hi — fresh subprocess
    # sessions, 2 in-session runs each). Why this design: the VM reports 32
    # cores but delivers ~16, and co-tenant load swings by the hour —
    # identical runs measured walls spreading up to 50% (BENCH/BASELINE.md).
    # Interleaving makes both legs sample the same noise phases so the
    # RATIO cancels phase effects to first order; min-over-passes converges
    # to the steady state (noise only slows runs). Round-3 lesson: a
    # SINGLE-thread calibration probe read "quiet" while multi-core
    # co-tenant pressure degraded the local[4] legs to an official 0.76 —
    # so the probe is now a 4-PROCESS spin (same concurrency as the hi
    # leg), each pass reports its own PAIRED ratio, and the JSON carries
    # median/max-of-passes plus an explicit window classification. A
    # degraded window can no longer masquerade as a quiet one.
    if os.environ.get("SPARK_GRAFT_GATE_PAIR", "1") == "1":
        gate_docs = max(n_docs // 2, 100_000)
        gate_path = os.path.join(
            os.environ.get("SPARK_GRAFT_TMP", "/tmp"),
            f"bench_pages_{gate_docs}.parquet",
        )
        spark = get_spark(master=f"local[{cpus}]", app_name="bench_synth2",
                          shuffle_partitions=cpus)
        synth_pages(spark, gate_docs, gate_path)
        spark.stop()

        n_passes = int(os.environ.get("SPARK_GRAFT_GATE_PASSES", "3"))
        legs = {"local[1]": [], "local[4]": []}
        cals = []
        for _pass in range(n_passes):
            for master, shuf in (("local[1]", 1), ("local[4]", 4)):
                cals.append(calibrate_parallel())
                r = kg_run_subprocess(master, gate_path, shuf, runs=2)
                legs[master].append(r)
        lo_walls = [r["wall_sec"] for r in legs["local[1]"]]
        hi_walls = [r["wall_sec"] for r in legs["local[4]"]]
        lo_wall, hi_wall = min(lo_walls), min(hi_walls)
        n_tri = legs["local[1]"][0]["n_triples"]
        lo_tps, hi_tps = n_tri / lo_wall, n_tri / hi_wall
        # paired per-pass ratios: each pass's lo and hi legs ran back to
        # back in the same noise phase, so their ratio is phase-insulated
        per_pass = [round(lo / hi / 4, 3)
                    for lo, hi in zip(lo_walls, hi_walls)]
        import statistics

        spread = max(
            (max(w) - min(w)) / min(w) for w in (lo_walls, hi_walls)
        )
        cal_max = max(cals)
        # quiet parallel-probe baseline on this VM: 1.4-1.8 s (4 x 20M-iter
        # spins + Pool fork overhead); >2.6 s means the 4-way window the hi
        # leg needs was contended. Wall spread > 30% across passes means at
        # least one pass hit a bad phase even if the probes looked clean.
        window = "quiet" if cal_max <= 2.6 and spread <= 0.30 else "degraded"
        result["scaling_live"] = {
            "gate_docs": gate_docs,
            "local1_tps": round(lo_tps, 1),
            "local4_tps": round(hi_tps, 1),
            "local1_walls": [round(w, 3) for w in lo_walls],
            "local4_walls": [round(w, 3) for w in hi_walls],
            "efficiency_1_to_4": round((hi_tps / lo_tps) / 4, 3),
            "efficiency_per_pass": per_pass,
            "efficiency_pass_median": round(statistics.median(per_pass), 3),
            "efficiency_pass_max": round(max(per_pass), 3),
            "calibration_parallel_sec": cals,
            "wall_spread": round(spread, 3),
            "window": window,
            "note": f"{n_passes} interleaved passes; efficiency_1_to_4 = "
                    "min-wall-per-leg ratio (cleanest-window estimator); "
                    "per-pass = paired same-phase ratios, median rejects a "
                    "single bad pass; calibration = wall of 4 concurrent "
                    "20M-iter python spins (quiet 1.4-1.8s on this VM, "
                    ">2.6s = the 4-way window was contended); window = "
                    "degraded means the gate number is NOT trustworthy "
                    "from this run alone — rerun on a quiet box before "
                    "treating <0.8 as a regression; slight >1.0 efficiency "
                    "= single-threaded tail at N=1; gate >= 0.8",
        }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # N -> 4N proxy at two windows; see BENCH/BASELINE.md for the
        # hardware-ceiling control experiments that contextualize these
        runs = {
            n: kg_run_subprocess(f"local[{n}]", pages_path, n)
            for n in (2, 4, 8, 16, 32)
        }
        result["scaling"] = {
            f"local{n}": {k: round(v, 3) for k, v in r.items()}
            for n, r in runs.items()
        }
        for lo_n, hi_n in ((2, 8), (4, 16), (8, 32)):
            result["scaling"][f"efficiency_{lo_n}_to_{hi_n}"] = round(
                (runs[hi_n]["triples_per_sec"]
                 / runs[lo_n]["triples_per_sec"]) / 4, 3
            )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
