"""A2 event-level + argument-level P/R/F1 (reference
precision_recall_fscore.py:38-74 semantics)."""

from fastie_spark.metrics import event_prf
from fastie_spark.session import local_df

SCHEMA = ("url string, event_type string, trigger string, role string, "
          "argument string, event_key string")


def _df(spark, rows):
    return local_df(
        spark,
        [dict(zip(["url", "event_type", "trigger", "role", "argument",
                   "event_key"], r)) for r in rows],
        SCHEMA,
    )


def test_event_prf(spark):
    gold = _df(spark, [
        ("u1", "layoff", "裁员", "count", "900人", "g1"),
        ("u1", "layoff", "裁员", "company", "X", "g1"),
        ("u2", "found", "成立", "founder", "A", "g2"),
    ])
    pred = _df(spark, [
        # exact match of g1
        ("u1", "layoff", "裁员", "count", "900人", "p1"),
        ("u1", "layoff", "裁员", "company", "X", "p1"),
        # wrong argument -> event miss, but one argument tuple matches
        ("u2", "found", "成立", "founder", "B", "p2"),
        # trigger-less prediction -> not counted at event level
        ("u2", "found", None, "founder", "A", "p3"),
    ])
    m = event_prf(pred, gold)
    # event level: preds counted = p1, p2 (trigger-bearing); tp = p1
    assert m["event_precision"] == 0.5
    assert m["event_recall"] == 0.5
    # argument level (trigger excluded): pred tuples {(u1,count),(u1,company),
    # (u2,B),(u2,A)} = 4, gold = 3, tp = 3
    assert m["argu_precision"] == 0.75
    assert m["argu_recall"] == 1.0


def test_metric_aggregations_are_single_job(no_aqe):
    """The fused metric formulations run ONE Spark job per metric (the old
    shape was 3 jobs for micro_prf and 6 for event_prf — at 100 TB that is
    3-6 redundant scans of corpus-derived pred/gold tables)."""
    from conftest import count_jobs
    from fastie_spark.metrics import event_prf_df, micro_prf_df

    spark = no_aqe
    gold = _df(spark, [("u1", "layoff", "裁员", "count", "900人", "g1")])
    pred = _df(spark, [("u1", "layoff", "裁员", "count", "900人", "p1")])
    gold.count()  # warm python workers outside the probe
    assert count_jobs(
        spark, lambda: micro_prf_df(pred, gold, ["url", "role"]).collect()
    ) == 1
    assert count_jobs(
        spark, lambda: event_prf_df(pred, gold).collect()
    ) == 1


def test_event_prf_exact_on_extraction(spark, pages_df, vocab):
    """Self-comparison of the extraction output must be exactly 1.0 —
    catches representation drift between rows and the metric."""
    from fastie_spark.pipeline import run_extraction_fused

    ev = run_extraction_fused(spark, pages_df, vocab, persist=False)["events"]
    m = event_prf(ev, ev)
    assert m["event_f1"] == 1.0 and m["argu_f1"] == 1.0
