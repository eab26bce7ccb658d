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
