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
