"""run_ie serving façade (reference POST /v1/ie capability,
fastie/api/app.py:65-81 + protocol.py:25-78)."""

import pytest

from fastie_spark.api import run_ie
from fastie_spark.uie import multi_stage_predict


def test_run_ie_ner_and_re(spark, vocab):
    subj, pred, obj = vocab.relation_vocab[0]
    texts = [f"{subj}和{obj}的报道。", "无关内容。"]
    ner = run_ie(spark, texts, task="named-entity-recognition", vocab=vocab)
    assert ner["object"] == "named-entity-recognition"
    assert any(m[3] == subj for m in ner["labels"][0])
    assert ner["labels"][1] == []
    re_ = run_ie(spark, texts, task="relation-extraction", vocab=vocab)
    assert (subj, pred, obj) in re_["labels"][0]


def test_run_ie_events(spark, vocab):
    etype, args = vocab.event_vocab[0]
    body = "，".join(f"{r}为{a}" for r, a in args)
    out = run_ie(spark, [f"发生{etype}事件：{body}。"],
                 task="event-extraction", vocab=vocab)
    evs = out["labels"][0]
    assert any(e["event_type"] == etype for e in evs)


def test_run_ie_uie_matches_oracle_nesting(spark, vocab):
    """The re-nested UIE labels match multi_stage_predict's dict shape."""
    subj, pred, obj = vocab.relation_vocab[0]
    lbl = dict(vocab.entity_vocab)[subj]
    schema = [{lbl: [pred]}]
    texts = [f"{subj}和{obj}。", "没有任何命中。"]
    out = run_ie(spark, texts, task="uie", vocab=vocab, ie_schema=schema)
    want = multi_stage_predict(texts, schema, vocab)

    def canon(res):
        # compare text/start/end/probability + relation nesting
        def citem(it):
            base = (it["text"], it.get("start"), it.get("end"),
                    round(it["probability"], 6))
            rels = {
                k: sorted(map(citem, v))
                for k, v in it.get("relations", {}).items()
            }
            return (base, tuple(sorted(rels.items())))
        return [
            {k: sorted(map(citem, v)) for k, v in r.items()} for r in res
        ]

    assert canon(out["labels"]) == canon(want)
    # the relation child actually fired
    assert any("relations" in it
               for r in want for v in r.values() for it in v)


def test_run_ie_validation(spark, vocab):
    with pytest.raises(ValueError):
        run_ie(spark, "x", task="nope", vocab=vocab)
    with pytest.raises(ValueError):
        run_ie(spark, "x", task="uie", vocab=vocab)  # schema required
    cls = run_ie(spark, ["文本"], task="text-classification", vocab=vocab)
    assert cls["labels"] == [None]
