#!/usr/bin/env python
"""True multi-executor scaling evidence: run the e2e KG job on Spark
local-cluster mode (separate executor JVMs, real inter-executor shuffle,
modules shipped via addPyFile — the in-sandbox equivalent of
``spark-submit --py-files`` on a multi-executor cluster).

    python jobs/cluster_scaling.py 'local-cluster[1,4,6144]' 4 /tmp/pages.parquet
    python jobs/cluster_scaling.py 'local-cluster[4,4,6144]' 16 /tmp/pages.parquet
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    master, shuf, pages_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    repartition = len(sys.argv) < 5 or sys.argv[4] != "norepart"

    from fastie_spark.fixtures import (
        build_alias_edges,
        build_linker_dict,
        build_vocab,
    )
    from fastie_spark.kg_job import run_kg_job
    from fastie_spark.session import get_spark, local_df

    zip_path = os.path.join(tempfile.gettempdir(), "fastie_spark.zip")
    if os.path.exists(zip_path):
        os.remove(zip_path)  # zip -r updates in place; stale modules linger
    subprocess.run(
        ["zip", "-qr", zip_path, "fastie_spark", "-x", "*__pycache__*"],
        cwd=REPO, check=True,
    )

    spark = get_spark(master=master, shuffle_partitions=shuf,
                      extra_conf={"spark.executor.memory": "6g"})
    spark.sparkContext.addPyFile(zip_path)  # --py-files equivalent
    vocab = build_vocab()
    linker = local_df(
        spark, build_linker_dict(vocab),
        "alias string, canonical_id string, entity_type string, prior double",
    )
    edges = local_df(spark, build_alias_edges(vocab)[0], "src string, dst string")
    pages = spark.read.parquet(pages_path)
    walls, n = [], 0
    for _ in range(2):
        out = tempfile.mkdtemp(prefix="kgc_")
        t0 = time.time()
        res = run_kg_job(spark, pages, vocab, linker, edges, out_dir=out,
                         snapshot_id="c", n_buckets=32,
                         repartition=repartition)
        walls.append(time.time() - t0)
        n = res["n_triples"]
        shutil.rmtree(out, ignore_errors=True)
    print(f"RESULT master={master} repartition={repartition} n_triples={n} "
          f"cold={walls[0]:.1f}s warm={min(walls):.1f}s tps={n / min(walls):.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
