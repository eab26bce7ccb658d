"""UIE (M16-M18) semantics + Spark-vs-oracle parity."""

from collections import Counter

import pytest

from fastie_spark.uie import (
    build_tree,
    flatten_oracle_results,
    get_id_and_prob,
    multi_stage_predict,
    run_uie_spark,
    single_stage_predict,
    UIEScorer,
)

SCHEMA = None  # set per vocab in fixture


def test_build_tree_shapes():
    t = build_tree([{"竞赛名称": ["主办方", "承办方"]}, "时间"])
    assert [c.name for c in t.children] == ["竞赛名称", "时间"]
    assert [c.name for c in t.children[0].children] == ["主办方", "承办方"]
    t2 = build_tree([{"a": "b"}])
    assert t2.children[0].children[0].name == "b"


def test_get_id_and_prob_offset_rebias():
    # [CLS] p r [SEP] c o n [SEP] — prompt len 2, content len 3
    om = [[0, 0], [0, 1], [1, 2], [0, 0], [0, 1], [1, 2], [2, 3], [0, 0]]
    spans = {((4, 1.0), (6, 0.9))}  # content tokens 4..6 -> chars 0..3
    ids, probs = get_id_and_prob(spans, om)
    assert ids == [(0, 3)] and probs == [pytest.approx(0.9)]
    # prompt-internal span -> negative ids (cls task path)
    om2 = [[0, 0], [0, 1], [1, 2], [0, 0], [0, 1], [0, 0]]
    ids2, _ = get_id_and_prob({((1, 1.0), (2, 1.0))}, om2)
    assert ids2 == [(-3, -1)]


def test_single_stage_entity_prompt(vocab):
    scorer = UIEScorer(vocab)
    surf, lbl = vocab.entity_vocab[0]
    text = f"xx{surf}yy{surf}zz"
    res = single_stage_predict([{"text": text, "prompt": lbl}], scorer)
    spans = {(r["text"], r["start"], r["end"]) for r in res[0]}
    assert (surf, 2, 2 + len(surf)) in spans
    assert len(spans) == 2  # both occurrences


def test_single_stage_relation_prompt(vocab):
    scorer = UIEScorer(vocab)
    subj, pred, obj = vocab.relation_vocab[0]
    text = f"{subj}和{obj}。"
    res = single_stage_predict([{"text": text, "prompt": f"{subj}的{pred}"}], scorer)
    assert {r["text"] for r in res[0]} == {obj}


def test_cls_prompt_majority_vote(vocab):
    scorer = UIEScorer(vocab)
    # long doc -> chunks; option '正向' appears in content -> cls vote
    text = ("正向" + "x" * 300) * 3
    res = single_stage_predict(
        [{"text": text, "prompt": "情感倾向[正向,负向]"}], scorer
    )
    assert res[0] == [{"text": "正向", "probability": pytest.approx(1.0)}]


@pytest.fixture(scope="module")
def uie_schema(vocab):
    subj, pred, obj = vocab.relation_vocab[0]
    lbl = dict(vocab.entity_vocab)[subj]
    other = next(l for l in ("per", "org", "loc") if l != lbl)
    return [{lbl: [pred, "author"]}, other]


def test_uie_english_mode(vocab):
    """is_english prompt composition: child prompt = name + ' of ' + parent."""
    subj, pred, obj = next(
        (s, p, o) for s, p, o in vocab.relation_vocab
        if " " not in s and s.isascii() and o not in s
    )
    lbl = dict(vocab.entity_vocab)[subj]
    text = f"{subj} something {obj}."
    res = multi_stage_predict([text], [{lbl: [pred]}], vocab, is_english=True)
    tops = res[0].get(lbl, [])
    subj_hits = [t for t in tops if t["text"] == subj]
    assert subj_hits
    rels = [r["text"] for t in subj_hits
            for r in t.get("relations", {}).get(pred, [])]
    assert obj in rels


def test_uie_cls_node_in_schema(vocab):
    """A cls-options schema node goes through the M18 vote path."""
    res = multi_stage_predict(
        ["正向的评论内容"], ["情感倾向[正向,负向]"], vocab
    )
    out = res[0].get("情感倾向[正向,负向]", [])
    assert out and out[0]["text"] == "正向"
    assert "start" not in out[0]


def test_uie_spark_matches_oracle(spark, vocab, pages, uie_schema):
    texts = [p["text"] for p in pages]
    urls = [p["url"] for p in pages]
    oracle = multi_stage_predict(texts, uie_schema, vocab)
    want = Counter(flatten_oracle_results(urls, oracle, uie_schema))
    assert sum(want.values()) > 20

    pages_df = spark.createDataFrame(
        [{"url": u, "text": t} for u, t in zip(urls, texts)],
        "url string, text string",
    )
    got_rows = run_uie_spark(spark, pages_df, vocab, uie_schema).collect()
    got = Counter(
        (r["url"], r["path"], r["parent"], r["span"], r["start"], r["end"],
         r["probability"])
        for r in got_rows
    )
    assert got == want


def _spark_uie_counter(spark, urls, texts, vocab, schema, is_english=False):
    pages_df = spark.createDataFrame(
        [{"url": u, "text": t} for u, t in zip(urls, texts)],
        "url string, text string",
    )
    rows = run_uie_spark(spark, pages_df, vocab, schema,
                         is_english=is_english).collect()
    return Counter(
        (r["url"], r["path"], r["parent"], r["span"], r["start"], r["end"],
         r["probability"]) for r in rows
    )


def test_uie_spark_fullwidth_span_parity(spark):
    """A full-width extracted span must be dbc2sbc-normalized as part of the
    WHOLE composed child prompt (reference decode_utils.py:266) — the
    relation key here is the normalized form, so rows appear only when the
    Spark path normalizes the composed prompt exactly like the oracle."""
    from fastie_spark.scorer import Vocab

    vocab = Vocab(
        entity_vocab=[("Ｂｏｂ公司", "org"), ("中本聪", "per")],
        relation_vocab=[("Bob公司", "founder", "中本聪")],
    )
    schema = [{"org": ["founder"]}]
    texts = ["据报道Ｂｏｂ公司由中本聪创立。", "无关文本。"]
    urls = ["u1", "u2"]
    oracle = multi_stage_predict(texts, schema, vocab)
    want = Counter(flatten_oracle_results(urls, oracle, schema))
    got = _spark_uie_counter(spark, urls, texts, vocab, schema)
    assert got == want
    # the fix is exercised: the child relation actually fired
    assert any(k[1] == "org/founder" for k in want)


def test_uie_spark_english_mode_parity(spark):
    """English prompt composition on the Spark path ('{name} of {span}' and
    the cls-option splice) matches multi_stage_predict(is_english=True)."""
    from fastie_spark.scorer import Vocab

    vocab = Vocab(
        entity_vocab=[("Acme", "org"), ("Bob", "per")],
        relation_vocab=[("Acme", "founder", "Bob")],
    )
    schema = [{"org": ["founder", "sentiment[positive,negative]"]}]
    texts = [
        "Acme was founded by Bob. A positive story about Acme.",
        "Nothing relevant here.",
        "Acme again, negative tone only: negative.",
    ]
    urls = ["e1", "e2", "e3"]
    oracle = multi_stage_predict(texts, schema, vocab, is_english=True)
    want = Counter(flatten_oracle_results(urls, oracle, schema))
    got = _spark_uie_counter(spark, urls, texts, vocab, schema,
                             is_english=True)
    assert got == want
    assert any(k[1] == "org/founder" for k in want)          # relation fired
    assert any(
        k[1] == "org/sentiment[positive,negative]" for k in want
    )  # cls splice fired


def test_uie_bfs_job_count_independent_of_node_count(no_aqe, pages_df, vocab):
    """Scale gate for the level-wise BFS: Spark job count must NOT grow
    with the number of schema nodes (the old per-node formulation ran a
    max-prompt collect per node). Per level: one max-prompt agg (non-root
    levels only) + one checkpoint write; root prompts are literals."""
    from conftest import count_jobs

    spark = no_aqe
    subj, pred, _ = vocab.relation_vocab[0]
    lbl = dict(vocab.entity_vocab)[subj]
    other = next(l for _, l in vocab.entity_vocab if l != lbl)

    def jobs(schema):
        return count_jobs(
            spark,
            lambda: run_uie_spark(spark, pages_df, vocab, schema).collect(),
        )

    narrow = jobs([{lbl: [pred]}])
    wide = jobs([{lbl: [pred, "虚构关系甲", "虚构关系乙"]}, other])
    assert wide == narrow, (narrow, wide)


def test_uie_bfs_resume_mid_schema(spark, vocab, pages, uie_schema, tmp_path,
                                   monkeypatch):
    """Kill between levels, resume to an identical result. First run dies
    when the child level's extraction stage is built (level 0 already
    parquet-committed with its manifest); the resume run must (a) NOT
    recompute level 0 — its parquet files stay byte-untouched — and
    (b) finish to the exact row multiset of an uninterrupted run."""
    import os

    import fastie_spark.uie as uie_mod

    pages_df = spark.createDataFrame(
        [{"url": p["url"], "text": p["text"]} for p in pages],
        "url string, text string",
    )

    def rows(df):
        return Counter(
            (r["url"], r["path"], r["parent"], r["span"], r["start"],
             r["end"], r["probability"]) for r in df.collect()
        )

    clean = rows(run_uie_spark(spark, pages_df, vocab, uie_schema,
                               work_dir=str(tmp_path / "clean")))
    assert sum(clean.values()) > 20

    work_dir = str(tmp_path / "crashy")
    real_fn = uie_mod._uie_level_fn

    def dying_fn(vocab_, maxp_by_path, *a, **k):
        if any("/" in p for p in maxp_by_path):  # a child level
            raise RuntimeError("simulated crash between levels")
        return real_fn(vocab_, maxp_by_path, *a, **k)

    monkeypatch.setattr(uie_mod, "_uie_level_fn", dying_fn)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_uie_spark(spark, pages_df, vocab, uie_schema,
                      work_dir=work_dir, resume=True).collect()
    monkeypatch.setattr(uie_mod, "_uie_level_fn", real_fn)

    l0 = os.path.join(work_dir, "level_0")
    assert os.path.exists(os.path.join(work_dir, "_manifest_level_0.json"))
    before = {f: os.path.getmtime(os.path.join(l0, f))
              for f in os.listdir(l0)}
    resumed = rows(run_uie_spark(spark, pages_df, vocab, uie_schema,
                                 work_dir=work_dir, resume=True))
    after = {f: os.path.getmtime(os.path.join(l0, f))
             for f in os.listdir(l0)}
    assert before == after  # level 0 read back, not rewritten
    assert resumed == clean


def test_uie_bfs_resume_rejects_changed_params(spark, vocab, pages,
                                               uie_schema, tmp_path):
    """A committed level is only reusable at the same decode parameters:
    changing position_prob must invalidate the manifest fingerprint and
    recompute instead of serving stale rows."""
    import os

    pages_df = spark.createDataFrame(
        [{"url": p["url"], "text": p["text"]} for p in pages],
        "url string, text string",
    )
    work_dir = str(tmp_path / "wd")
    run_uie_spark(spark, pages_df, vocab, uie_schema, work_dir=work_dir,
                  resume=True).collect()
    l0 = os.path.join(work_dir, "level_0")
    before = {f: os.path.getmtime(os.path.join(l0, f))
              for f in os.listdir(l0)}
    run_uie_spark(spark, pages_df, vocab, uie_schema, work_dir=work_dir,
                  resume=True, position_prob=0.9).collect()
    after = {f: os.path.getmtime(os.path.join(l0, f))
             for f in os.listdir(l0)}
    assert before != after  # fingerprint mismatch -> recomputed
