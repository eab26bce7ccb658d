"""Driver contract for the spark-graft builder (PySpark target).

entry():      flagship GPLinker triple extraction over sf0.001 documents.
queries():    every implemented operator from SURVEY.md §2 + the KG chain +
              the training-data-pipeline ops (dedup/similarity/text
              analysis), each as (spark, sf_dir) -> DataFrame.
oracle_sql(): matching DuckDB SQL. The KG chain (mention detect -> GPLinker
              triples -> linking -> canonicalization -> graph edges) uses a
              vocabulary derived from the documents table by a closed-form
              rule (fastie_spark/derive.py), so even the extraction
              operators have exact SQL oracles; only event extraction
              (clique search) is rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastie_spark.cc import canonicalize, connected_components
from fastie_spark.derive import (
    derived_alias_edges,
    derived_linker_rows,
    derived_vocab,
    docs_as_pages,
)
from fastie_spark.fixtures import NER_LABELS, PREDICATES
from fastie_spark.linking import link_triples
from fastie_spark.pipeline import run_extraction
from fastie_spark.session import local_df
from fastie_spark.textops import REGISTRY

# ---------------------------------------------------------------------------
# cached derived-vocab KG pipeline per sf_dir (the driver calls each query
# separately; extraction is computed once and the result DataFrames persisted)
# ---------------------------------------------------------------------------
_KG_CACHE: dict = {}


def _kg(spark: SparkSession, sf_dir: str) -> dict:
    # cache keyed by (application, sf_dir): persisted DataFrames die with
    # their session, so a driver that recreates sessions per query must not
    # get stale handles
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    if cache_key in _KG_CACHE:
        return _KG_CACHE[cache_key]
    # entries from other (stopped) sessions are unreachable — drop them so a
    # session-per-query driver doesn't accumulate orphaned handles
    app = spark.sparkContext.applicationId
    for k in [k for k in _KG_CACHE if k[0] != app]:
        del _KG_CACHE[k]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab, toks = derived_vocab(spark, docs)
    pages = docs_as_pages(docs)
    ext = run_extraction(spark, pages, vocab, persist=True)  # one UDF pass
    mentions = ext["mentions"]
    triples = ext["triples"].persist()  # feeds linking chain repeatedly
    events = ext["events"]

    linker = local_df(
        spark, derived_linker_rows(toks),
        "alias string, canonical_id string, entity_type string, prior double",
    )
    # exact-match linking: the derived dictionary is surface-exact and the
    # SQL oracle assigns ids per raw token, so normalization collisions
    # (case/width-equal tokens) must not merge ids here
    linked = link_triples(triples, linker, normalize=False).select(
        "url", "subj", "pred", "obj", "subj_id", "obj_id"
    ).persist()

    edges = derived_alias_edges(spark, len(toks))
    components = connected_components(edges).persist()

    can = canonicalize(linked, components, "subj_id", "subj_comp")
    can = canonicalize(can, components, "obj_id", "obj_comp")
    graph_edges = (
        can.groupBy(
            F.col("subj_comp").alias("subj_id"),
            "pred",
            F.col("obj_comp").alias("obj_id"),
        )
        .agg(F.count("*").cast("long").alias("n_support"))
        .persist()
    )

    out = {
        "mentions": mentions,
        "triples": triples,
        "events": events,
        "linked": linked,
        "components": components,
        "graph_edges": graph_edges,
    }
    _KG_CACHE[cache_key] = out
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: GPLinker triple extraction on sf0.001 documents."""
    return _kg(spark, "/root/testdata/sf0.001")["triples"]


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable] = {
        name: (lambda s, d, fn=fn: fn(s, d)) for name, (fn, _) in REGISTRY.items()
    }
    def decoder_coverage(s, d):
        """Per-decoder mention/triple counts over the full M1-M13 decoder
        matrix (rows-only check; per-decoder semantics are pytest-gated)."""
        from fastie_spark.multi_decoder import run_multi_decoder

        docs = s.read.parquet(f"{d}/documents.parquet")
        vocab, _ = derived_vocab(s, docs)
        out = run_multi_decoder(s, docs_as_pages(docs), vocab)
        return (
            out.groupBy("decoder", "kind")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy("decoder", "kind")
        )

    q["decoder_coverage"] = decoder_coverage

    def uie_extract(s, d):
        """UIE schema-tree extraction (M16-M18) over derived vocab: 2-level
        schema {label: [pred, pred]} + a flat label (rows-only check;
        Spark==oracle parity is pytest-gated in tests/test_uie.py)."""
        from fastie_spark.uie import run_uie_spark

        docs = s.read.parquet(f"{d}/documents.parquet")
        vocab, _ = derived_vocab(s, docs)
        if not vocab.relation_vocab:
            return s.createDataFrame([], "url string, path string")
        subj, pred, _ = vocab.relation_vocab[0]
        lbl = dict(vocab.entity_vocab)[subj]
        other = next(x for x in NER_LABELS if x != lbl)
        schema = [{lbl: [pred]}, other]
        out = run_uie_spark(s, docs_as_pages(docs), vocab, schema)
        return out.select(
            "url", "path", "parent", "span",
            F.col("start").cast("long").alias("start"),
            F.col("end").cast("long").alias("end"),
            F.round("probability", 6).alias("probability"),
        )

    q["uie_extract"] = uie_extract

    def classify_docs(s, d):
        """M19 text classification analogue: per-doc argmax over class
        evidence (mention counts per label), ties -> lexicographic."""
        from pyspark.sql import Window

        m = _kg(s, d)["mentions"]
        counts = m.groupBy("url", "label").agg(
            F.count("*").cast("long").alias("n_mentions")
        )
        w = Window.partitionBy("url").orderBy(
            F.desc("n_mentions"), F.asc("label")
        )
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("url", F.col("label").alias("pred_label"), "n_mentions")
        )

    q["classify_docs"] = classify_docs

    def spo_convert(s, d):
        """P1 judge filter + P2 char-offset annotate
        (fastie/data/relation_extraction.py:25-66): keep (text, spo) pairs
        whose subject AND object occur verbatim; emit first-occurrence char
        spans [sub_start, sub_end, pred_id, obj_start, obj_end] (inclusive
        ends). Broadcast the spo side; instr stays in codegen."""
        docs = s.read.parquet(f"{d}/documents.parquet")
        vocab, _ = derived_vocab(s, docs)
        pred2id = {p: i for i, p in enumerate(vocab.predicates())}
        rel = local_df(
            s,
            [{"subj": a, "pred": p, "obj": o, "pred_id": pred2id[p]}
             for a, p, o in vocab.relation_vocab],
            "subj string, pred string, obj string, pred_id long",
        )
        dd = docs.select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
            "text",
        )
        j = dd.crossJoin(F.broadcast(rel)).filter(
            (F.instr("text", F.col("subj")) > 0)
            & (F.instr("text", F.col("obj")) > 0)
        )
        sub = (F.instr("text", F.col("subj")) - 1).cast("long")
        obj = (F.instr("text", F.col("obj")) - 1).cast("long")
        return j.select(
            "url", "subj", "pred", "obj",
            sub.alias("sub_start"),
            (sub + F.length("subj") - 1).alias("sub_end"),
            "pred_id",
            obj.alias("obj_start"),
            (obj + F.length("obj") - 1).alias("obj_end"),
        )

    q["spo_convert"] = spo_convert
    q["extract_mentions"] = lambda s, d: _kg(s, d)["mentions"]
    q["extract_triples"] = lambda s, d: _kg(s, d)["triples"]
    q["extract_events"] = lambda s, d: _kg(s, d)["events"]
    q["link_triples"] = lambda s, d: _kg(s, d)["linked"]
    q["canonical_components"] = lambda s, d: _kg(s, d)["components"].select(
        "node", "component"
    )
    q["graph_edges"] = lambda s, d: _kg(s, d)["graph_edges"]
    return q


# ---------------------------------------------------------------------------
# oracle SQL — shared closed-form vocab-derivation CTE block
# ---------------------------------------------------------------------------
_LABELS_SQL = "[" + ", ".join(f"'{x}'" for x in NER_LABELS) + "]"
_PREDS_SQL = "[" + ", ".join(f"'{x}'" for x in PREDICATES) + "]"

_VOCAB_CTE = r"""
cand AS (
  SELECT tok, cast(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_extract_all(text, '[\p{L}\p{N}]+')) AS tok
        FROM documents)
  WHERE length(tok) >= 3
  GROUP BY tok ORDER BY n DESC, tok LIMIT 200
),
surv AS (
  SELECT c.tok, c.n FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM cand u
    WHERE u.tok <> c.tok
      AND (position(c.tok IN u.tok) > 0 OR position(u.tok IN c.tok) > 0)
      AND (u.n > c.n OR (u.n = c.n AND u.tok < c.tok)))
),
ent AS (
  SELECT tok, cast(row_number() OVER (ORDER BY n DESC, tok) - 1 AS BIGINT) AS i
  FROM surv QUALIFY i < 150
),
nent AS (SELECT cast(count(*) AS BIGINT) AS c FROM ent),
de AS (
  SELECT d.doc_id, d.text, e.tok, e.i
  FROM documents d JOIN ent e ON position(e.tok IN d.text) > 0
),
occ AS (
  SELECT doc_id, tok, i,
         cast(p - 1 AS BIGINT) AS pos, cast(length(tok) AS BIGINT) AS len
  FROM de, unnest(generate_series(1, length(de.text))) AS t(p)
  WHERE substring(de.text, cast(p AS INT), length(de.tok)) = de.tok
    AND (p - 1) // 510 = (p - 1 + length(de.tok) - 1) // 510
),
rel AS (
  SELECT DISTINCT es.tok AS subj,
         (""" + _PREDS_SQL + r""")[g.i % 12 + 1] AS pred,
         eo.tok AS obj
  FROM generate_series(0, 99) AS g(i), nent
  JOIN ent es ON es.i = g.i % nent.c
  JOIN ent eo ON eo.i = (g.i + 1 + (g.i * 7) % (nent.c - 1)) % nent.c
  WHERE es.i <> eo.i
),
chunk_occ AS (
  SELECT DISTINCT doc_id, tok, pos // 510 AS ck FROM occ
),
triples AS (
  SELECT DISTINCT 'doc://' || s.doc_id AS url, r.subj, r.pred, r.obj,
         es.i AS si, eo.i AS oi
  FROM rel r
  JOIN chunk_occ s ON s.tok = r.subj
  JOIN chunk_occ o ON o.tok = r.obj AND o.doc_id = s.doc_id AND o.ck = s.ck
  JOIN ent es ON es.tok = r.subj
  JOIN ent eo ON eo.tok = r.obj
)
"""

_MENTIONS_SQL = (
    "WITH " + _VOCAB_CTE + r"""
SELECT 'doc://' || doc_id AS url,
       (""" + _LABELS_SQL + r""")[i % 8 + 1] AS label,
       pos AS start, pos + len AS "end", tok AS surface
FROM occ
"""
)

_TRIPLES_SQL = (
    "WITH " + _VOCAB_CTE + "\nSELECT url, subj, pred, obj FROM triples"
)

_LINKED_SQL = (
    "WITH " + _VOCAB_CTE + r"""
SELECT url, subj, pred, obj,
       printf('Q%05d', si) AS subj_id, printf('Q%05d', oi) AS obj_id
FROM triples
"""
)

_COMPONENTS_SQL = (
    "WITH " + _VOCAB_CTE + r"""
SELECT printf('Q%05d', i) AS node,
       printf('Q%05d', 3 * (i // 3)) AS component
FROM ent, nent
WHERE NOT (i % 3 = 0 AND i + 1 >= nent.c)
"""
)

_GRAPH_EDGES_SQL = (
    "WITH " + _VOCAB_CTE + r"""
SELECT printf('Q%05d', 3 * (si // 3)) AS subj_id, pred,
       printf('Q%05d', 3 * (oi // 3)) AS obj_id,
       cast(count(*) AS BIGINT) AS n_support
FROM triples GROUP BY 1, 2, 3
"""
)


_CLASSIFY_SQL = (
    "WITH " + _VOCAB_CTE + r""",
lab AS (
  SELECT 'doc://' || doc_id AS url,
         (""" + _LABELS_SQL + r""")[i % 8 + 1] AS label,
         cast(count(*) AS BIGINT) AS n_mentions
  FROM occ GROUP BY 1, 2
)
SELECT url, label AS pred_label, n_mentions
FROM (SELECT *, row_number() OVER (PARTITION BY url
                                   ORDER BY n_mentions DESC, label) AS rn
      FROM lab)
WHERE rn = 1
"""
)


_SPO_CONVERT_SQL = (
    "WITH " + _VOCAB_CTE + r""",
pred_ids AS (
  SELECT pred, cast(row_number() OVER (ORDER BY pred) - 1 AS BIGINT) AS pred_id
  FROM (SELECT DISTINCT pred FROM rel)
)
SELECT 'doc://' || d.doc_id AS url, r.subj, r.pred, r.obj,
       cast(position(r.subj IN d.text) - 1 AS BIGINT) AS sub_start,
       cast(position(r.subj IN d.text) - 1 + length(r.subj) - 1 AS BIGINT)
         AS sub_end,
       p.pred_id,
       cast(position(r.obj IN d.text) - 1 AS BIGINT) AS obj_start,
       cast(position(r.obj IN d.text) - 1 + length(r.obj) - 1 AS BIGINT)
         AS obj_end
FROM documents d
JOIN rel r ON position(r.subj IN d.text) > 0 AND position(r.obj IN d.text) > 0
JOIN pred_ids p ON p.pred = r.pred
"""
)


def oracle_sql() -> dict[str, str]:
    o = {name: sql for name, (_, sql) in REGISTRY.items() if sql}
    o["classify_docs"] = _CLASSIFY_SQL
    o["spo_convert"] = _SPO_CONVERT_SQL
    o["extract_mentions"] = _MENTIONS_SQL
    o["extract_triples"] = _TRIPLES_SQL
    o["link_triples"] = _LINKED_SQL
    o["canonical_components"] = _COMPONENTS_SQL
    o["graph_edges"] = _GRAPH_EDGES_SQL
    # extract_events: clique-search decode — not SQL-expressible; rows-only
    return o
