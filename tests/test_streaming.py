"""Structured-Streaming incremental ingestion: exactly-once snapshots across
restarts, plus the watermarked window aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from fastie_spark.fixtures import build_linker_dict, build_pages
from fastie_spark.session import local_df
from fastie_spark.streaming.incremental import (
    PAGES_DDL,
    mention_rate,
    run_incremental_extraction,
)

PAGES_SCHEMA = PAGES_DDL


@pytest.fixture(scope="module")
def linker_df(spark, vocab):
    return local_df(
        spark, build_linker_dict(vocab),
        "alias string, canonical_id string, entity_type string, prior double",
    )


def _write_wave(spark, pages, path, name):
    local_df(spark, pages, PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_exactly_once(spark, vocab, linker_df, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir, exist_ok=True)

    all_pages = build_pages(vocab, n_docs=60, seed=3)
    _write_wave(spark, all_pages[:30], in_dir, "w1")
    run_incremental_extraction(spark, in_dir, out_dir, ckpt, vocab, linker_df)
    prov1 = spark.read.parquet(os.path.join(out_dir, "provenance"))
    n1 = prov1.count()
    urls1 = {r["url"] for r in prov1.select("url").distinct().collect()}
    assert n1 > 0
    assert urls1 <= {p["url"] for p in all_pages[:30]}

    # second wave: only the new files are processed (streaming checkpoint)
    _write_wave(spark, all_pages[30:], in_dir, "w2")
    run_incremental_extraction(spark, in_dir, out_dir, ckpt, vocab, linker_df)
    prov2 = spark.read.parquet(os.path.join(out_dir, "provenance"))
    n2 = prov2.count()
    assert n2 > n1
    # no duplicated triples for wave-1 urls (exactly-once)
    dup = (
        prov2.groupBy("url", "subj", "pred", "obj").count().filter("count > 1")
    )
    assert dup.count() == 0

    # re-run with no new input: nothing changes (idempotent restart)
    run_incremental_extraction(spark, in_dir, out_dir, ckpt, vocab, linker_df)
    assert spark.read.parquet(os.path.join(out_dir, "provenance")).count() == n2
    # snapshots recorded per epoch
    manifests = [f for f in os.listdir(out_dir) if f.startswith("_manifest_")]
    assert len(manifests) >= 2


def test_mention_rate_window(spark, vocab, tmp_path):
    in_dir = str(tmp_path / "win_in")
    pages = build_pages(vocab, n_docs=40, seed=5)
    local_df(spark, pages, PAGES_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
    agg = mention_rate(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("rates")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM rates").collect()
    assert sum(r["n_pages"] for r in rows) == 40
    assert all(r["window"]["start"] is not None for r in rows)


def test_stateful_dedup_stream(spark, vocab, tmp_path):
    """applyInPandasWithState cross-batch dedup: re-delivered urls are
    suppressed on the second wave because per-shard state remembers them."""
    from fastie_spark.streaming.stateful import dedup_stream

    in_dir = str(tmp_path / "dd_in")
    out_dir = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    os.makedirs(in_dir, exist_ok=True)
    pages = build_pages(vocab, n_docs=30, seed=9)

    def run_wave(rows):
        local_df(spark, rows, PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
        q = (
            dedup_stream(stream)
            .writeStream.outputMode("append")
            .format("parquet").option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_wave(pages[:20])
    assert spark.read.parquet(out_dir).count() == 20
    # wave 2: 10 repeats + 10 new -> only the 10 new pass the state filter
    run_wave(pages[10:])
    out = (
        spark.read.parquet(out_dir)
        .groupBy("url").count().collect()
    )
    assert len(out) == 30
    assert all(r["count"] == 1 for r in out)


def test_stateful_dedup_stream_bloom(spark, vocab, tmp_path):
    """Bounded-state Bloom variant: same first-seen contract across waves,
    but per-shard state is a fixed-size bit array (m_bits) instead of the
    growing url set. m sized so false positives are ~impossible for 30
    urls; a cross-batch repeat is still always suppressed."""
    from fastie_spark.streaming.stateful import dedup_stream_bloom

    in_dir = str(tmp_path / "bd_in")
    out_dir = str(tmp_path / "bd_out")
    ckpt = str(tmp_path / "bd_ckpt")
    os.makedirs(in_dir, exist_ok=True)
    pages = build_pages(vocab, n_docs=30, seed=9)

    def run_wave(rows):
        local_df(spark, rows, PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
        q = (
            dedup_stream_bloom(stream, m_bits=1 << 16, k=4)
            .writeStream.outputMode("append")
            .format("parquet").option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_wave(pages[:20])
    assert spark.read.parquet(out_dir).count() == 20
    run_wave(pages[10:])
    out = spark.read.parquet(out_dir).groupBy("url").count().collect()
    assert len(out) == 30
    assert all(r["count"] == 1 for r in out)


def test_bloom_params_validated():
    import pytest

    from fastie_spark.streaming.stateful import make_bloom_dedup_fn

    with pytest.raises(ValueError, match="multiple of 8"):
        make_bloom_dedup_fn(m_bits=12, k=2)
    with pytest.raises(ValueError, match=r"k must be"):
        make_bloom_dedup_fn(m_bits=64, k=5)
    make_bloom_dedup_fn(m_bits=64, k=4)  # boundary values are fine


def test_stateful_dedup_stream_ttl(spark, vocab, tmp_path):
    """Event-time TTL dedup: a url re-delivered WITHIN the ttl is
    suppressed; re-delivered AFTER ttl of silence it is emitted again
    (recrawl-freshness semantics); brand-new urls always pass. State
    expires with the watermark (bounded over unbounded streams)."""
    import datetime

    from fastie_spark.streaming.stateful import dedup_stream_ttl

    in_dir = str(tmp_path / "ttl_in")
    out_dir = str(tmp_path / "ttl_out")
    ckpt = str(tmp_path / "ttl_ckpt")
    os.makedirs(in_dir, exist_ok=True)
    pages = build_pages(vocab, n_docs=25, seed=13)
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)

    def stamped(rows, minutes):
        ts = base + datetime.timedelta(minutes=minutes)
        return [{**r, "warc_ts": ts} for r in rows]

    def run_wave(rows):
        local_df(spark, rows, PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
        q = (
            dedup_stream_ttl(stream, ttl="1 hour",
                             watermark_delay="10 minutes")
            .writeStream.outputMode("append")
            .format("parquet").option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # wave 1: u0..u19 at t0 -> all emitted
    run_wave(stamped(pages[:20], 0))
    assert spark.read.parquet(out_dir).count() == 20

    # wave 2: u0..u9 at t0+30min (inside ttl -> suppressed),
    #         u10..u19 at t0+2h (ttl elapsed -> re-emitted),
    #         u20..u24 new at t0+2h -> emitted
    run_wave(stamped(pages[:10], 30) + stamped(pages[10:20], 120)
             + stamped(pages[20:], 120))
    out = spark.read.parquet(out_dir).groupBy("url").count().collect()
    counts = {r["url"]: r["count"] for r in out}
    for p in pages[:10]:
        assert counts[p["url"]] == 1  # inside-ttl repeat suppressed
    for p in pages[10:20]:
        assert counts[p["url"]] == 2  # post-ttl recrawl re-emitted
    for p in pages[20:]:
        assert counts[p["url"]] == 1  # new url passes


def test_streaming_kg_pipeline_ttl_compose(spark, vocab, linker_df, tmp_path):
    """The full continuous composition: TTL-deduped pages -> extract ->
    link -> materialize, ONE streaming query. Covers (a) exactly-once under
    an epoch REPLAY (commit marker deleted -> batch re-executes -> the
    idempotent snapshot overwrite absorbs it), (b) in-TTL re-delivery never
    re-extracted, (c) post-TTL recrawl re-extracted into a new epoch."""
    import datetime
    import shutil

    from fastie_spark.streaming.incremental import run_streaming_kg_pipeline

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir, exist_ok=True)
    pages = build_pages(vocab, n_docs=25, seed=13)
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)

    def stamped(rows, minutes):
        ts = base + datetime.timedelta(minutes=minutes)
        return [{**r, "warc_ts": ts} for r in rows]

    def write_wave(rows):
        local_df(spark, rows, PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    def run():
        run_streaming_kg_pipeline(spark, in_dir, out_dir, ckpt, vocab,
                                  linker_df, ttl="1 hour",
                                  watermark_delay="10 minutes")

    def prov():
        return spark.read.parquet(os.path.join(out_dir, "provenance"))

    # wave 1: 20 urls at t0
    write_wave(stamped(pages[:20], 0))
    run()
    n1 = prov().count()
    assert n1 > 0
    snaps1 = {r["snapshot_id"] for r in prov().select("snapshot_id")
              .distinct().collect()}

    # REPLAY the committed epoch: drop the newest commit marker; restart
    # re-executes that batch (state rolls back to the pre-batch version,
    # the TTL filter re-emits identical rows) and the per-(snapshot,bucket)
    # overwrite must leave provenance byte-count-identical
    cdir = os.path.join(ckpt, "commits")
    last = sorted(f for f in os.listdir(cdir) if not f.startswith("."))[-1]
    os.remove(os.path.join(cdir, last))
    crc = os.path.join(cdir, f".{last}.crc")  # hadoop local-FS sidecar
    if os.path.exists(crc):
        os.remove(crc)
    run()
    assert prov().count() == n1

    # wave 2: urls 0-9 re-delivered INSIDE ttl (suppressed), urls 10-19
    # recrawled PAST ttl (re-extracted), urls 20-24 new
    write_wave(stamped(pages[:10], 30) + stamped(pages[10:20], 120)
               + stamped(pages[20:], 120))
    run()
    per_url_snaps = {
        r["url"]: r["n"]
        for r in prov().groupBy("url")
        .agg(F.countDistinct("snapshot_id").alias("n")).collect()
    }
    for p in pages[:10]:
        if p["url"] in per_url_snaps:
            assert per_url_snaps[p["url"]] == 1  # in-TTL repeat suppressed
    recrawled = [p["url"] for p in pages[10:20] if p["url"] in per_url_snaps]
    assert recrawled  # some wave-1 urls with triples were recrawled
    for u in recrawled:
        assert per_url_snaps[u] == 2  # post-TTL recrawl re-extracted
    for p in pages[20:]:
        if p["url"] in per_url_snaps:
            assert per_url_snaps[p["url"]] == 1
    # and no triple is duplicated WITHIN a snapshot
    dup = (prov().groupBy("snapshot_id", "url", "subj", "pred", "obj")
           .count().filter("count > 1"))
    assert dup.count() == 0
