"""Set-metric aggregations as DataFrame joins (SURVEY.md §2.6 A1/A2).

Reference semantics: exact-match micro P/R/F1 over doc-qualified tuple sets
(/root/reference/fastie/metrics/extraction/precision_recall_fscore.py:11-35,
/root/reference/examples/relation_extraction/evaluate.py:27-33):
``tp = |gold ∩ pred|``, ``P = tp/|pred|``, ``R = tp/|gold|``,
``F1 = 2PR/(P+R)``. The set intersection is an inner equi-join on all key
columns after per-side dedup; fully relational, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def micro_prf_df(pred: DataFrame, gold: DataFrame, keys: list[str]) -> DataFrame:
    """One-row DataFrame (tp, n_pred, n_gold, precision, recall, f1)."""
    p = pred.select(*keys).dropDuplicates(keys)
    g = gold.select(*keys).dropDuplicates(keys)
    tp = p.join(g, keys, "inner").count()
    n_pred, n_gold = p.count(), g.count()
    prec = tp / n_pred if n_pred else 0.0
    rec = tp / n_gold if n_gold else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    spark = pred.sparkSession
    return spark.createDataFrame(
        [(tp, n_pred, n_gold, float(prec), float(rec), float(f1))],
        "tp long, n_pred long, n_gold long, precision double, recall double, f1 double",
    )


def micro_prf(pred: DataFrame, gold: DataFrame, keys: list[str]) -> dict:
    row = micro_prf_df(pred, gold, keys).collect()[0]
    return row.asDict()


def _event_arrays(events: DataFrame, require_trigger: bool) -> DataFrame:
    """(url, event_key, ...) rows -> one row per distinct event with its
    sorted argument array incl. the synthetic trigger tuple — the reference
    compares events as sorted tuple lists
    (precision_recall_fscore.py:44-55)."""
    args = events.filter(F.col("role").isNotNull()).select(
        "url", "event_key",
        F.struct("event_type", "role", "argument").alias("a"),
    )
    trig = (
        events.filter(F.col("trigger").isNotNull())
        .select(
            "url", "event_key",
            F.struct(
                "event_type", F.lit("触发词").alias("role"),
                F.col("trigger").alias("argument"),
            ).alias("a"),
        )
        .dropDuplicates(["url", "event_key"])
    )
    ev = (
        args.union(trig)
        .groupBy("url", "event_key")
        .agg(F.sort_array(F.collect_set("a")).alias("event"))
    )
    if require_trigger:
        ev = ev.filter(
            F.exists("event", lambda a: a["role"] == F.lit("触发词"))
        )
    # DedupList semantics: identical events within a doc count once
    return ev.select("url", "event").dropDuplicates(["url", "event"])


def event_prf(pred: DataFrame, gold: DataFrame) -> dict:
    """A2: event-level (exact sorted-argument-list match, trigger-bearing
    predictions only) + argument-level (tuples excl. trigger) micro P/R/F1
    (precision_recall_fscore.py:38-74)."""
    pe = _event_arrays(pred, require_trigger=True)
    ge = _event_arrays(gold, require_trigger=False)
    e_tp = pe.join(ge, ["url", "event"], "inner").count()
    e_pred, e_gold = pe.count(), ge.count()

    keys = ["url", "event_type", "role", "argument"]
    pa = pred.filter(F.col("role").isNotNull()).select(*keys).dropDuplicates(keys)
    ga = gold.filter(F.col("role").isNotNull()).select(*keys).dropDuplicates(keys)
    a_tp = pa.join(ga, keys, "inner").count()
    a_pred, a_gold = pa.count(), ga.count()

    def prf(tp, np_, ng):
        p = tp / np_ if np_ else 0.0
        r = tp / ng if ng else 0.0
        return p, r, (2 * p * r / (p + r) if p + r else 0.0)

    ep, er, ef = prf(e_tp, e_pred, e_gold)
    ap, ar, af = prf(a_tp, a_pred, a_gold)
    return {
        "event_precision": ep, "event_recall": er, "event_f1": ef,
        "argu_precision": ap, "argu_recall": ar, "argu_f1": af,
    }


def event_prf_df(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """event_prf as ONE declarative DataFrame (no driver-side counts): the
    six counts are 1-row aggregates cross-joined (each a map-side-combinable
    count at scale), P/R/F1 computed in-plan. Same semantics as event_prf
    (A2, precision_recall_fscore.py:38-74)."""
    pe = _event_arrays(pred, require_trigger=True)
    ge = _event_arrays(gold, require_trigger=False)
    e_tp = pe.join(ge, ["url", "event"], "inner").agg(
        F.count("*").cast("long").alias("e_tp"))
    e_np = pe.agg(F.count("*").cast("long").alias("e_pred"))
    e_ng = ge.agg(F.count("*").cast("long").alias("e_gold"))

    keys = ["url", "event_type", "role", "argument"]
    pa = pred.filter(F.col("role").isNotNull()).select(*keys).dropDuplicates(keys)
    ga = gold.filter(F.col("role").isNotNull()).select(*keys).dropDuplicates(keys)
    a_tp = pa.join(ga, keys, "inner").agg(
        F.count("*").cast("long").alias("a_tp"))
    a_np = pa.agg(F.count("*").cast("long").alias("a_pred"))
    a_ng = ga.agg(F.count("*").cast("long").alias("a_gold"))

    row = (
        e_tp.crossJoin(e_np).crossJoin(e_ng)
        .crossJoin(a_tp).crossJoin(a_np).crossJoin(a_ng)
    )

    def prf(tp, np_, ng, prefix):
        p = F.when(F.col(np_) > 0, F.col(tp) / F.col(np_)).otherwise(0.0)
        r = F.when(F.col(ng) > 0, F.col(tp) / F.col(ng)).otherwise(0.0)
        f = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(0.0)
        return [
            F.round(p, 6).alias(f"{prefix}_precision"),
            F.round(r, 6).alias(f"{prefix}_recall"),
            F.round(f, 6).alias(f"{prefix}_f1"),
        ]

    return row.select(
        "e_tp", "e_pred", "e_gold", "a_tp", "a_pred", "a_gold",
        *prf("e_tp", "e_pred", "e_gold", "event"),
        *prf("a_tp", "a_pred", "a_gold", "argu"),
    )
