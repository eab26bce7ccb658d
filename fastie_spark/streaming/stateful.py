"""Custom stateful streaming operator: cross-batch url dedup
(applyInPandasWithState — the SURVEY.md §2.8 'custom stateful operator'
slot; no reference counterpart, required by the streaming surface).

A crawl stream re-delivers urls (recrawls, mirror copies). This operator
keys the stream by a url-hash shard and keeps a per-shard state of seen
url hashes, emitting only first-seen pages downstream — the streaming
analogue of dedup_exact, with bounded state per shard (hashes, not pages).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_DDL = "url string, text string, lang string"
STATE_DDL = "seen array<string>"
N_SHARDS = 64


def _dedup_fn(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        for url, text, lang in zip(pdf["url"], pdf["text"], pdf["lang"]):
            if url is None:  # poison row: drop, never into state
                continue
            if url not in seen:
                seen.add(url)
                out.append((url, text, lang))
    state.update((sorted(seen),))
    yield pd.DataFrame(out, columns=["url", "text", "lang"])


def dedup_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming first-seen url filter. Shard by url hash so state is
    distributed and each task's state stays small; within a shard the state
    is the sorted list of seen urls (swap for a bloom/sketch at true scale —
    the operator contract stays identical)."""
    sharded = pages_stream.select(
        "url", "text", "lang",
        F.pmod(F.xxhash64("url"), F.lit(N_SHARDS)).alias("shard"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Bounded-state variant: Bloom-filter state per shard (the true-scale path).
# ---------------------------------------------------------------------------
BLOOM_STATE_DDL = "bits binary, n long"


def make_bloom_dedup_fn(m_bits: int, k: int):
    """Per-shard Bloom-filter first-seen filter. State is a FIXED-SIZE bit
    array (m_bits) + insert count, so per-shard state no longer grows with
    the stream (the exact-set variant above keeps every url). Trade-off:
    false positives — a never-seen url can be dropped with probability
    ~(1 - e^(-k*n/m))^k; at 10^12 urls over enough shards that is the
    standard dedup-at-scale contract. No false negatives: a re-delivered
    url is always suppressed. Hash = md5(url) sliced into k indexes,
    engine-portable and deterministic."""
    import hashlib

    if m_bits <= 0 or m_bits % 8 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 8, got {m_bits}")
    if not 1 <= k <= 4:
        # k indexes are 4-byte slices of the 16-byte md5 digest; k > 4 would
        # silently read past the digest and degrade to constant-0 indexes
        raise ValueError(f"k must be in [1, 4], got {k}")
    n_bytes = m_bits // 8

    def fn(key, pdfs, state):
        if state.exists:
            got = state.get
            bits = bytearray(got[0])
            n = int(got[1])
        else:
            bits = bytearray(n_bytes)
            n = 0
        out = []
        for pdf in pdfs:
            for url, text, lang in zip(pdf["url"], pdf["text"], pdf["lang"]):
                if url is None:
                    continue
                h = hashlib.md5(url.encode("utf-8")).digest()
                idxs = [
                    int.from_bytes(h[i * 4 : (i + 1) * 4], "little") % m_bits
                    for i in range(k)
                ]
                if all(bits[i >> 3] >> (i & 7) & 1 for i in idxs):
                    continue  # seen (or false positive)
                for i in idxs:
                    bits[i >> 3] |= 1 << (i & 7)
                n += 1
                out.append((url, text, lang))
        state.update((bytes(bits), n))
        yield pd.DataFrame(out, columns=["url", "text", "lang"])

    return fn


# ---------------------------------------------------------------------------
# TTL variant: event-time-expiring state (recrawl-freshness semantics).
# ---------------------------------------------------------------------------
TTL_OUT_DDL = "url string, text string, lang string, warc_ts timestamp"
TTL_STATE_DDL = "urls array<string>, ts array<long>"  # epoch millis


def make_ttl_dedup_fn(ttl_ms: int):
    """Per-shard first-seen-within-TTL filter: a url is emitted when never
    seen, or when its event time is >= last SIGHTING + ttl (sliding window —
    a recrawl after ttl of silence is fresh content again; a url re-seen
    within the window stays suppressed and the window slides forward from
    the new sighting). State is bounded in TIME, not just
    space: entries with stored_ts + ttl < watermark are evicted — any
    future event the watermark still admits (ts >= watermark) would satisfy
    the re-emission condition anyway, so the entry carries no information.
    That is the honest unbounded-crawl contract: state size ~ distinct urls
    per TTL window, not per stream lifetime. Rows are processed in
    (event_time, url) order so output is batch-arrival-order independent."""
    if ttl_ms <= 0:
        raise ValueError(f"ttl_ms must be positive, got {ttl_ms}")

    def fn(key, pdfs, state):
        if state.exists:
            got = state.get
            seen = dict(zip(got[0], got[1]))
        else:
            seen = {}
        rows = []
        for pdf in pdfs:
            for url, text, lang, ts in zip(
                pdf["url"], pdf["text"], pdf["lang"], pdf["warc_ts"]
            ):
                if url is None or ts is None:
                    continue
                rows.append((int(ts.value) // 1_000_000, url, text, lang, ts))
        rows.sort(key=lambda r: (r[0], r[1]))
        out = []
        for ts_ms, url, text, lang, ts in rows:
            last = seen.get(url)
            if last is None or ts_ms >= last + ttl_ms:
                seen[url] = ts_ms
                out.append((url, text, lang, ts))
            elif ts_ms > last:
                # refresh the suppression horizon: the url was re-seen, so
                # the next emission needs ttl of silence after THIS sighting
                seen[url] = ts_ms
        wm = state.getCurrentWatermarkMs()
        if wm > 0:
            seen = {u: t for u, t in seen.items() if t + ttl_ms >= wm}
        state.update((list(seen.keys()), list(seen.values())))
        yield pd.DataFrame(out, columns=["url", "text", "lang", "warc_ts"])

    return fn


def dedup_stream_ttl(pages_stream: DataFrame, ttl: str = "1 hour",
                     watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming first-seen filter with an event-time TTL: re-delivered urls
    are suppressed only within ``ttl`` of their last sighting; state expires
    with the watermark. ttl: an interval string like '1 hour'."""
    import re as _re

    m = _re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", ttl.strip())
    if not m:
        raise ValueError(f"unsupported ttl {ttl!r}")
    ttl_ms = int(m.group(1)) * {
        "second": 1_000, "minute": 60_000, "hour": 3_600_000,
        "day": 86_400_000,
    }[m.group(2)]
    sharded = pages_stream.withWatermark("warc_ts", watermark_delay).select(
        "url", "text", "lang", "warc_ts",
        F.pmod(F.xxhash64("url"), F.lit(N_SHARDS)).alias("shard"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        make_ttl_dedup_fn(ttl_ms),
        outputStructType=TTL_OUT_DDL,
        stateStructType=TTL_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream_bloom(pages_stream: DataFrame, m_bits: int = 1 << 20,
                       k: int = 4) -> DataFrame:
    """Streaming first-seen url filter with O(1) per-shard state (Bloom
    bits instead of the exact url set) — same operator contract as
    dedup_stream, bounded memory at any stream length."""
    sharded = pages_stream.select(
        "url", "text", "lang",
        F.pmod(F.xxhash64("url"), F.lit(N_SHARDS)).alias("shard"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        make_bloom_dedup_fn(m_bits, k),
        outputStructType=OUT_DDL,
        stateStructType=BLOOM_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
