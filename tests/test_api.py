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
    assert ner["id"].startswith("ner-")
    # reference set2json shape: {label: [{"start","end","text"}]}
    items = [it for lst in ner["labels"][0].values() for it in lst]
    assert any(it["text"] == subj for it in items)
    assert all(set(it) == {"start", "end", "text"} for it in items)
    assert ner["labels"][1] == {}
    re_ = run_ie(spark, texts, task="relation-extraction", vocab=vocab)
    assert re_["id"].startswith("rel-")
    assert {"subject": subj, "object": obj} in re_["labels"][0].get(pred, [])
    assert "batch_size" not in re_  # reference response has no such field


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


def test_http_v1_ie_round_trip(spark, vocab):
    """POST /v1/ie over a real socket — the reference's literal serving
    surface (app.py:65-81), stdlib-bound. Covers: 200 happy path with the
    task-prefixed response shape, 401 on bad bearer token, 400 on bad body,
    404 on a wrong path."""
    import json
    import urllib.error
    import urllib.request

    from fastie_spark.server import create_server, serve_in_background

    subj, pred, obj = vocab.relation_vocab[0]
    srv = create_server(spark, vocab, task="relation-extraction",
                        api_key="sek")
    serve_in_background(srv)
    host, port = srv.server_address
    url = f"http://{host}:{port}/v1/ie"

    def post(path_url, body, key="sek"):
        req = urllib.request.Request(
            path_url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {key}"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())

    try:
        status, resp = post(url, {"texts": [f"{subj}和{obj}。"]})
        assert status == 200
        assert resp["id"].startswith("rel-")
        assert resp["object"] == "relation-extraction"
        assert {"subject": subj, "object": obj} in resp["labels"][0].get(
            pred, []
        )

        with pytest.raises(urllib.error.HTTPError) as e:
            post(url, {"texts": ["x"]}, key="wrong")
        assert e.value.code == 401
        assert json.loads(e.value.read())["detail"] == "Invalid API key."

        with pytest.raises(urllib.error.HTTPError) as e:
            post(url, {"no_texts": True})
        assert e.value.code == 400

        # wrong-TYPED numeric fields are valid JSON but must still be a
        # 400, not an unhandled TypeError deep in run_ie (round-3 ADVICE)
        with pytest.raises(urllib.error.HTTPError) as e:
            post(url, {"texts": ["x"], "max_length": "not-a-number"})
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            post(url, {"texts": ["x"], "batch_size": [16]})
        assert e.value.code == 400
        # int-valued strings coerce (urlencoded clients send "512")
        status, _ = post(url, {"texts": [f"{subj}和{obj}。"],
                               "max_length": "512", "batch_size": "4"})
        assert status == 200

        with pytest.raises(urllib.error.HTTPError) as e:
            post(f"http://{host}:{port}/v2/other", {"texts": ["x"]})
        assert e.value.code == 404

        # GET / serves the playground page (the Gradio-demo analogue)
        with urllib.request.urlopen(url.rsplit("/v1/ie", 1)[0] + "/",
                                    timeout=30) as r:
            page = r.read().decode()
            assert r.status == 200
            assert "Fast Information Extraction Demo" in page
            assert "/v1/ie" in page
    finally:
        srv.shutdown()
        srv.server_close()


def test_run_ie_validation(spark, vocab):
    with pytest.raises(ValueError):
        run_ie(spark, "x", task="nope", vocab=vocab)
    with pytest.raises(ValueError):
        run_ie(spark, "x", task="uie", vocab=vocab)  # schema required
    cls = run_ie(spark, ["文本"], task="text-classification", vocab=vocab)
    assert cls["labels"] == [None]


def test_cli_vocab_loading(tmp_path, vocab):
    """python -m fastie_spark vocab-JSON loading round-trips the Vocab
    (the model-artifact analogue of the reference CLI's model path)."""
    import json

    from fastie_spark.__main__ import load_vocab

    p = tmp_path / "vocab.json"
    p.write_text(json.dumps({
        "entity_vocab": [list(x) for x in vocab.entity_vocab],
        "relation_vocab": [list(x) for x in vocab.relation_vocab],
        "event_vocab": [[e, [list(a) for a in args]]
                        for e, args in vocab.event_vocab],
    }, ensure_ascii=False))
    v = load_vocab(str(p), fixture=False)
    assert v.entity_vocab == [tuple(x) for x in vocab.entity_vocab]
    assert v.relation_vocab == [tuple(x) for x in vocab.relation_vocab]
    assert v.fingerprint() == vocab.fingerprint()
    assert load_vocab(None, fixture=True).entity_vocab  # built-in path
