"""Derive an extraction vocabulary deterministically from the documents
table, so the KG pipeline (mention detection -> GPLinker triples -> linking
-> canonicalization -> graph edges) runs on driver-supplied data AND has an
exact ANSI-SQL oracle (the derivation rule is closed-form, so DuckDB can
reproduce the whole chain: SURVEY.md §7.1 step 5).

Rule (identical in Spark and the oracle SQL in __spark_entry__.py):
  candidates = top N_CAND tokens (regex [\\p{L}\\p{N}]+, len>=3) by
               (count DESC, token ASC)
  entities   = candidates that lose no substring-containment conflict
               (in any pair where one contains the other, only the
               higher-priority one survives), re-ranked; entity i gets
               label NER_LABELS[i % 8] and canonical id Q{i:05d}
  relations  = for i in 0..N_REL-1:  subj = tok[i % n],
               obj = tok[(i + 1 + (i*7) % (n-1)) % n], skip subj==obj,
               pred = PREDICATES[i % 12]; distinct
  alias edges= chain consecutive canonical ids in groups of 3
               (edge Q_i—Q_{i+1} iff i % 3 != 2), so the expected
               component of Q_i is Q_{3*(i//3)} in closed form.

Label discovery is collected to the driver and broadcast — the reference's
own pattern (sorted-distinct label scan, SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixtures import NER_LABELS, PREDICATES
from .scorer import Vocab

N_CAND = 200
N_ENTITIES = 150
N_RELATIONS = 100
MIN_TOKEN_LEN = 3
TOKEN_RE = r"[\p{L}\p{N}]+"


def ranked_tokens(spark: SparkSession, docs: DataFrame) -> list[tuple[str, int]]:
    """[(token, count)] after containment filtering, priority-ranked."""
    counts = (
        docs.select(
            F.explode(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0)).alias("tok")
        )
        .filter(F.length("tok") >= MIN_TOKEN_LEN)
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(N_CAND)
        .collect()
    )
    cand = [(r["tok"], r["n"]) for r in counts]

    def prio(tc):
        return (-tc[1], tc[0])

    survivors = []
    for t, c in cand:
        loses = any(
            (t != u and (t in u or u in t) and prio((u, cu)) < prio((t, c)))
            for u, cu in cand
        )
        if not loses:
            survivors.append((t, c))
    survivors.sort(key=prio)
    return survivors[:N_ENTITIES]


def derived_vocab(spark: SparkSession, docs: DataFrame) -> tuple[Vocab, list[str]]:
    """(vocab, entity_surfaces_by_rank). Entity rank i <-> canonical Q{i:05d}."""
    toks = [t for t, _ in ranked_tokens(spark, docs)]
    n = len(toks)
    entity_vocab = [(t, NER_LABELS[i % len(NER_LABELS)]) for i, t in enumerate(toks)]
    rels = set()
    if n >= 2:
        for i in range(N_RELATIONS):
            si = i % n
            oi = (i + 1 + (i * 7) % (n - 1)) % n
            if si == oi:
                continue
            rels.add((toks[si], PREDICATES[i % len(PREDICATES)], toks[oi]))
    # event instance patterns over the commonest tokens, one DISTINCT event
    # type per pattern. Distinct types make the reference clique decode
    # closed-form (each type's argu graph = complete clique of first
    # occurrences + isolated extra occurrences; after the trigger filter and
    # subset-dedup exactly one event per doc*pattern survives, with an
    # argument row per co-occurring founder/company token), so
    # extract_events gets an exact DuckDB oracle (__spark_entry__._EVENTS_SQL)
    events = []
    for j in range(min(8, max(n - 4, 0))):
        events.append(
            (
                f"evt{j:02d}",
                [("触发词", toks[j]), ("founder", toks[(j + 3) % n]),
                 ("company", toks[(j + 5) % n])],
            )
        )
    return Vocab(
        entity_vocab=entity_vocab,
        relation_vocab=sorted(rels),
        event_vocab=events,
    ), toks


def derived_linker_rows(toks: list[str]) -> list[dict]:
    return [
        {"alias": t, "canonical_id": f"Q{i:05d}", "entity_type":
         NER_LABELS[i % len(NER_LABELS)], "prior": 1.0}
        for i, t in enumerate(toks)
    ]


def derived_alias_edges(spark: SparkSession, n: int) -> DataFrame:
    """Chain groups of 3: edge Q_i—Q_{i+1} iff i%3 != 2 and i+1 < n."""
    return (
        spark.range(0, max(n - 1, 0))
        .filter(F.col("id") % 3 != 2)
        .select(
            F.format_string("Q%05d", F.col("id")).alias("src"),
            F.format_string("Q%05d", F.col("id") + 1).alias("dst"),
        )
    )


def docs_as_pages(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> pages-shaped (url, text)."""
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
    )
