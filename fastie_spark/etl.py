"""Batch ETL operators (SURVEY.md §2.1 S6, §2.2 P7, §2.6 A3).

S6 doccano -> UIE converter (/root/reference/fastie/data/uie/doccano.py:15-131
+ utils.py:96-539): doccano ext export -> UIE prompt/result_list training
examples with negative prompts and an 8:1:1 split. Relational re-expression:
explode + joins; one deliberate deviation, documented: the reference samples
negative prompts with a process-global seeded RNG (set_seed + np.random),
which is not partitioning-invariant on a cluster — we select negatives by
content hash (md5(text || prompt) ordering), deterministic under any
parallelism. Split is the same hash-split family as textops.train_val_split.

P7 DuEE event flattening (fastie/data/event_extraction.py:71-98): event_list
-> [[event_type, role, text, start, end]] rows including the synthetic
trigger row, with the lstrip offset fix.

A3 UIE span eval (fastie/metrics/extraction/span.py:84-165): span-set
micro P/R/F1 == an inner join on (example, start, end) — thin wrapper over
metrics.micro_prf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOCCANO_DDL = (
    "doc_id long, text string, "
    "entities array<struct<id:long, label:string, start_offset:long, "
    "end_offset:long>>, "
    "relations array<struct<from_id:long, to_id:long, type:string>>"
)

DUEE_DDL = (
    "doc_id string, text string, event_list array<struct<event_type:string, "
    "trigger:string, trigger_start_index:long, "
    "arguments:array<struct<argument_start_index:long, role:string, "
    "argument:string>>>>"
)


def duee_flatten(events: DataFrame) -> DataFrame:
    """DuEE records -> one row per (event, role) incl. the trigger row
    (role 触发词), offsets corrected for leading whitespace and emitted as
    strings, exactly like duee_v1_process."""
    ev = events.select(
        "doc_id", "text", F.posexplode("event_list").alias("event_idx", "e")
    )
    trig_off = F.length("e.trigger") - F.length(F.ltrim(F.col("e.trigger")))
    triggers = ev.select(
        "doc_id", "event_idx",
        F.col("e.event_type").alias("event_type"),
        F.lit("触发词").alias("role"),
        F.col("e.trigger").alias("argument"),
        (F.col("e.trigger_start_index") + trig_off).cast("string").alias("start"),
        (
            F.col("e.trigger_start_index") + trig_off
            + F.length(F.trim(F.col("e.trigger")))
        ).cast("string").alias("end"),
    )
    args = ev.select(
        "doc_id", "event_idx", F.col("e.event_type").alias("event_type"),
        F.explode("e.arguments").alias("a"),
    )
    arg_off = F.length("a.argument") - F.length(F.ltrim(F.col("a.argument")))
    arguments = args.select(
        "doc_id", "event_idx", "event_type",
        F.col("a.role").alias("role"),
        F.col("a.argument").alias("argument"),
        (F.col("a.argument_start_index") + arg_off).cast("string").alias("start"),
        (
            F.col("a.argument_start_index") + arg_off
            + F.length(F.trim(F.col("a.argument")))
        ).cast("string").alias("end"),
    )
    return triggers.unionByName(arguments)


def doccano_to_uie(doccano: DataFrame, negative_ratio: int = 3) -> DataFrame:
    """doccano ext export -> UIE examples
    (doc_id, prompt, content, result_list array<struct<text,start,end>>,
    split, is_negative).

    Positives: one example per (doc, entity label) with all spans of that
    label, and one per (doc, subject entity, relation type) with the object
    spans. Negatives: per doc, up to negative_ratio * n_positive prompts the
    doc does NOT realize (labels absent + subject×absent-relation prompts),
    chosen by md5 order (deterministic)."""
    ents = doccano.select(
        "doc_id", "text", F.explode("entities").alias("en")
    ).select(
        "doc_id", "text",
        F.col("en.id").alias("eid"), F.col("en.label").alias("label"),
        F.col("en.start_offset").alias("start"),
        F.col("en.end_offset").alias("end"),
        F.expr("substring(text, en.start_offset + 1, en.end_offset - en.start_offset)")
        .alias("ent_text"),
    )

    # entity-prompt positives
    ent_pos = (
        ents.groupBy("doc_id", "text", F.col("label").alias("prompt"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(
                    F.col("ent_text").alias("text"),
                    F.col("start"), F.col("end"),
                ))
            ).alias("result_list")
        )
        .withColumn("is_negative", F.lit(False))
    )

    # relation-prompt positives: subject text + 的 + relation type -> objects
    rels = doccano.select(
        "doc_id", F.explode("relations").alias("r")
    ).select("doc_id", "r.from_id", "r.to_id", "r.type")
    subj = ents.select("doc_id", F.col("eid").alias("from_id"),
                       F.col("ent_text").alias("subj_text"))
    obj = ents.select("doc_id", F.col("eid").alias("to_id"),
                      F.col("ent_text").alias("obj_text"),
                      F.col("start").alias("o_start"), F.col("end").alias("o_end"),
                      F.col("text").alias("text"))
    rel_pos = (
        rels.join(subj, ["doc_id", "from_id"])
        .join(obj, ["doc_id", "to_id"])
        .groupBy(
            "doc_id", "text",
            F.concat("subj_text", F.lit("的"), F.col("type")).alias("prompt"),
        )
        .agg(
            F.sort_array(
                F.collect_list(F.struct(
                    F.col("obj_text").alias("text"),
                    F.col("o_start").alias("start"),
                    F.col("o_end").alias("end"),
                ))
            ).alias("result_list")
        )
        .withColumn("is_negative", F.lit(False))
    )
    positives = ent_pos.unionByName(rel_pos)

    # negative prompts: all labels × docs minus realized, plus subject ×
    # unrealized relation types; ranked by md5, capped per doc
    labels = doccano.select(
        F.explode("entities").alias("en")
    ).select(F.col("en.label").alias("prompt")).distinct()
    rtypes = doccano.select(F.explode("relations").alias("r")).select(
        F.col("r.type").alias("rtype")).distinct()
    docs = doccano.select("doc_id", "text")
    cand_ent = docs.crossJoin(F.broadcast(labels))
    cand_rel = (
        ents.select("doc_id", "text", "ent_text").distinct()
        .crossJoin(F.broadcast(rtypes))
        .select("doc_id", "text",
                F.concat("ent_text", F.lit("的"), F.col("rtype")).alias("prompt"))
    )
    candidates = cand_ent.unionByName(cand_rel)
    realized = positives.select("doc_id", "prompt")
    negs = candidates.join(realized, ["doc_id", "prompt"], "left_anti")

    n_pos = positives.groupBy("doc_id").agg(F.count("*").alias("n_pos"))
    w = Window.partitionBy("doc_id").orderBy(
        F.md5(F.concat_ws("\x00", "doc_id", "prompt"))
    )
    negatives = (
        negs.withColumn("rn", F.row_number().over(w))
        .join(n_pos, "doc_id", "left")
        .filter(F.col("rn") <= negative_ratio * F.coalesce(F.col("n_pos"), F.lit(1)))
        .select(
            "doc_id", "text", "prompt",
            F.array().cast(
                "array<struct<text:string, start:long, end:long>>"
            ).alias("result_list"),
            F.lit(True).alias("is_negative"),
        )
    )

    out = positives.unionByName(negatives)
    h = F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|uie"))), 1, 2)
    return out.select(
        "doc_id", F.col("prompt"), F.col("text").alias("content"),
        "result_list", "is_negative",
        F.when(h < "cd", "train").when(h < "e6", "dev").otherwise("test")
        .alias("split"),
    )
