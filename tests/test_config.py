"""Config-file job launch (the reference's `fastie-cli train config.yaml`
front door, re-realized for the Spark entrypoints)."""

import argparse
import json
import os
import subprocess
import sys

import pytest

from fastie_spark.config import (
    apply_config_defaults,
    load_job_config,
    pop_config_arg,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_load_yaml_and_json(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("snapshot-id: s9\nn-buckets: 4\nsynthesize: 100\n")
    cfg = load_job_config(str(y))
    assert cfg == {"snapshot_id": "s9", "n_buckets": 4, "synthesize": 100}
    j = tmp_path / "c.json"
    j.write_text(json.dumps({"snapshot_id": "s8"}))
    assert load_job_config(str(j)) == {"snapshot_id": "s8"}
    bad = tmp_path / "l.yaml"
    bad.write_text("- a\n- b\n")
    with pytest.raises(SystemExit, match="flat mapping"):
        load_job_config(str(bad))


def test_pop_config_arg(tmp_path):
    c = tmp_path / "c.yaml"
    c.write_text("a: 1\n")
    assert pop_config_arg([str(c), "--x", "1"]) == (str(c), ["--x", "1"])
    assert pop_config_arg(["--x", "1"]) == (None, ["--x", "1"])
    # a flag VALUE ending in .json (e.g. --vocab vocab.json) is NOT a job
    # config — only position 0 counts (code-review regression)
    j = tmp_path / "vocab.json"
    j.write_text("{}")
    argv = ["--vocab", str(j)]
    assert pop_config_arg(argv) == (None, argv)
    # non-existent path is not silently treated as a config
    assert pop_config_arg(["/no/such.yaml"]) == (None, ["/no/such.yaml"])


def test_flags_override_config_and_unknown_keys_fail(tmp_path):
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot-id", default="snap-000")
    ap.add_argument("--n-buckets", type=int, default=32)
    apply_config_defaults(ap, {"snapshot_id": "from-file", "n_buckets": 4},
                          "c.yaml")
    args = ap.parse_args(["--snapshot-id", "from-flag"])
    assert args.snapshot_id == "from-flag"  # explicit flag wins
    assert args.n_buckets == 4  # file default applies
    with pytest.raises(SystemExit, match="unknown config key"):
        apply_config_defaults(ap, {"snapshoot_id": "typo"}, "c.yaml")


def test_run_kg_config_equals_flags(tmp_path):
    """The same job launched from a YAML config and from flags must produce
    identical graph output (provenance row multiset)."""
    import duckdb

    pages = str(tmp_path / "pages.parquet")
    out_flag = str(tmp_path / "g_flag")
    out_cfg = str(tmp_path / "g_cfg")
    common = dict(pages=pages, snapshot_id="s1", n_buckets=4,
                  synthesize=300, master="local[4]")

    def run(argv):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "run_kg.py"), *argv],
            check=True, capture_output=True, text=True, cwd=REPO,
        )

    run(["--pages", pages, "--out", out_flag, "--snapshot-id", "s1",
         "--n-buckets", "4", "--synthesize", "300", "--master", "local[4]"])

    cfgf = tmp_path / "job.yaml"
    cfgf.write_text(
        "\n".join(f"{k.replace('_', '-')}: {v}" for k, v in common.items())
        + f"\nout: {out_cfg}\n"
    )
    run([str(cfgf)])

    con = duckdb.connect()
    q = ("SELECT url, subj, pred, obj, subj_comp, obj_comp "
         "FROM read_parquet('{}/provenance/**/*.parquet') ORDER BY ALL")
    a = con.sql(q.format(out_flag)).fetchall()
    b = con.sql(q.format(out_cfg)).fetchall()
    assert a and a == b
