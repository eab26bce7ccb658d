"""S6 doccano->UIE ETL, P7 DuEE flattening, A3 span eval."""

import pytest
from pyspark.sql import Row

from fastie_spark.etl import DOCCANO_DDL, DUEE_DDL, doccano_to_uie, duee_flatten
from fastie_spark.metrics import micro_prf


@pytest.fixture(scope="module")
def doccano_df(spark):
    rows = [
        {
            "doc_id": 1,
            "text": "AliceBerlinCorp",
            "entities": [
                {"id": 1, "label": "per", "start_offset": 0, "end_offset": 5},
                {"id": 2, "label": "loc", "start_offset": 5, "end_offset": 11},
                {"id": 3, "label": "org", "start_offset": 11, "end_offset": 15},
            ],
            "relations": [{"from_id": 1, "to_id": 2, "type": "born_in"}],
        },
        {
            "doc_id": 2,
            "text": "BobParis",
            "entities": [
                {"id": 1, "label": "per", "start_offset": 0, "end_offset": 3},
                {"id": 2, "label": "loc", "start_offset": 3, "end_offset": 8},
            ],
            "relations": [],
        },
    ]
    return spark.createDataFrame(rows, DOCCANO_DDL)


def test_doccano_positives(spark, doccano_df):
    out = doccano_to_uie(doccano_df, negative_ratio=2)
    pos = {(r["doc_id"], r["prompt"]): r for r in out.collect()
           if not r["is_negative"]}
    r = pos[(1, "per")]
    assert [x.asDict() for x in r["result_list"]] == [
        {"text": "Alice", "start": 0, "end": 5}]
    r = pos[(1, "Alice的born_in")]
    assert [x.asDict() for x in r["result_list"]] == [
        {"text": "Berlin", "start": 5, "end": 11}]
    # doc 2 has no org entity -> no org positive
    assert (2, "org") not in pos


def test_doccano_negatives_capped_and_unrealized(spark, doccano_df):
    out = doccano_to_uie(doccano_df, negative_ratio=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {"pos": 0, "neg": 0})
        by_doc[r["doc_id"]]["neg" if r["is_negative"] else "pos"] += 1
    for d, c in by_doc.items():
        assert c["neg"] <= 2 * c["pos"]
    # every negative prompt is genuinely unrealized and has empty results
    pos_keys = {(r["doc_id"], r["prompt"]) for r in out if not r["is_negative"]}
    for r in out:
        if r["is_negative"]:
            assert (r["doc_id"], r["prompt"]) not in pos_keys
            assert r["result_list"] == []
    assert all(r["split"] in ("train", "dev", "test") for r in out)


def test_duee_flatten(spark):
    rows = [
        {
            "doc_id": "d1",
            "text": "X公司裁员 900人",
            "event_list": [
                {
                    "event_type": "组织关系-裁员",
                    "trigger": "裁员",
                    "trigger_start_index": 3,
                    "arguments": [
                        {"argument_start_index": 5, "role": "裁员人数",
                         "argument": " 900人"},  # leading space -> lstrip fix
                    ],
                }
            ],
        }
    ]
    df = spark.createDataFrame(rows, DUEE_DDL)
    got = {(r["role"], r["argument"], r["start"], r["end"])
           for r in duee_flatten(df).collect()}
    assert ("触发词", "裁员", "3", "5") in got
    # lstrip offset fix: start shifts past the leading space
    assert ("裁员人数", " 900人", "6", "10") in got


def test_a3_span_eval_join(spark):
    pred = spark.createDataFrame(
        [(0, 1, 3), (0, 4, 5), (1, 2, 10)], "ex long, start long, end long")
    gold = spark.createDataFrame(
        [(0, 1, 3), (0, 8, 9), (1, 2, 10)], "ex long, start long, end long")
    m = micro_prf(pred, gold, ["ex", "start", "end"])
    assert m["tp"] == 2 and m["n_pred"] == 3 and m["n_gold"] == 3
