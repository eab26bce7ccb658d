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


def convert_ext_examples_compat(rows: list, negative_ratio: int = 3,
                                seed: int = 1000,
                                schema_lang: str = "ch") -> tuple:
    """Faithful re-realization of the reference's seeded negative sampling
    (convert_ext_examples, /root/reference/fastie/data/uie/utils.py:231-539,
    driven by convert_uie_data's set_seed, doccano.py:15-16) for the
    is_train ext path: the SAME Mersenne-Twister call sequence
    (random.sample in add_entity_negative_example utils.py:96-128 and
    add_relation_negative_example utils.py:131-160, random.randrange in the
    redundants2/3 construction utils.py:448-496, and the num_sup supplement
    sample utils.py:512-520), consumed in document order. transformers
    set_seed seeds the process-global ``random``; ``random.Random(seed)``
    is the same generator, so outputs are example-identical to a reference
    run at the same seed with is_shuffle=False.

    This is the sequential COMPAT mode (a global RNG threaded through
    documents cannot be partitioned); the distributed default stays the
    hash-based doccano_to_uie. Scope: plain entity labels (no "##" aspect
    separator) — the documented engine surface.

    rows: [{doc_id?, text, entities: [{id,label,start_offset,end_offset}],
    relations: [{from_id,to_id,type}]}] in file order. Returns
    (entity_examples, relation_examples), each a list of
    {"content", "result_list", "prompt"} in reference emission order
    (positives then negatives)."""
    import math
    import random

    rng = random.Random(seed)

    texts = []
    entity_examples, relation_examples = [], []
    entity_prompts, relation_prompts = [], []
    entity_label_set: list = []   # insertion-ordered unique, like the ref
    entity_name_set: list = []
    predicate_set: list = []
    subject_goldens, inverse_relation_list, predicate_list = [], [], []

    for items in rows:
        text = items["text"]
        entities = items.get("entities") or []
        relations = items.get("relations") or []
        texts.append(text)

        entity_example_map: dict = {}
        entity_map: dict = {}
        entity_prompt = []
        for entity in entities:
            name = text[entity["start_offset"]:entity["end_offset"]]
            entity_map[entity["id"]] = {
                "name": name, "start": entity["start_offset"],
                "end": entity["end_offset"],
            }
            label = entity["label"]
            result = {"text": name, "start": entity["start_offset"],
                      "end": entity["end_offset"]}
            if label not in entity_example_map:
                entity_example_map[label] = {
                    "content": text, "result_list": [result], "prompt": label,
                }
            else:
                entity_example_map[label]["result_list"].append(result)
            if label not in entity_label_set:
                entity_label_set.append(label)
            if name not in entity_name_set:
                entity_name_set.append(name)
            entity_prompt.append(label)
        entity_examples.append(list(entity_example_map.values()))
        entity_prompts.append(entity_prompt)

        subject_golden: list = []
        relation_example_map: dict = {}
        relation_prompt, inverse_relation, predicates = [], [], []
        for relation in relations:
            predicate = relation["type"]
            s = entity_map[relation["from_id"]]
            o = entity_map[relation["to_id"]]
            if schema_lang == "ch":
                prompt = s["name"] + "的" + predicate
                inverse_negative = o["name"] + "的" + predicate
            else:
                prompt = predicate + " of " + s["name"]
                inverse_negative = predicate + " of " + o["name"]
            if s["name"] not in subject_golden:
                subject_golden.append(s["name"])
            result = {"text": o["name"], "start": o["start"], "end": o["end"]}
            inverse_relation.append(inverse_negative)
            predicates.append(predicate)
            if prompt not in relation_example_map:
                relation_example_map[prompt] = {
                    "content": text, "result_list": [result], "prompt": prompt,
                }
            else:
                relation_example_map[prompt]["result_list"].append(result)
            if predicate not in predicate_set:
                predicate_set.append(predicate)
            relation_prompt.append(prompt)
        relation_examples.append(list(relation_example_map.values()))
        relation_prompts.append(relation_prompt)
        subject_goldens.append(subject_golden)
        inverse_relation_list.append(inverse_relation)
        predicate_list.append(predicates)

    # stage 1: entity negatives (add_entity_negative_example semantics)
    positive_examples, negative_examples = [], []
    for i, prompt in enumerate(entity_prompts):
        redundants = sorted(set(entity_label_set) ^ set(prompt))
        num_positive = len(entity_examples[i])
        if num_positive != 0:
            actual_ratio = math.ceil(len(redundants) / num_positive)
        else:
            num_positive, actual_ratio = 1, 0
        if actual_ratio <= negative_ratio or negative_ratio == -1:
            idxs = list(range(len(redundants)))
        else:
            idxs = rng.sample(range(len(redundants)),
                              negative_ratio * num_positive)
        for idx in idxs:
            negative_examples.append(
                {"content": texts[i], "result_list": [],
                 "prompt": redundants[idx]}
            )
        positive_examples.extend(entity_examples[i])
    all_entity_examples = (
        positive_examples + negative_examples if positive_examples else []
    )

    # stage 2: relation negatives (utils.py:440-525 semantics)
    def add_relation_negatives(redundants, text, num_positive, ratio):
        if num_positive != 0:
            actual_ratio = math.ceil(len(redundants) / num_positive)
        else:
            num_positive, actual_ratio = 1, 0
        all_idxs = list(range(len(redundants)))
        if actual_ratio <= ratio or ratio == -1:
            idxs, rest_idxs = all_idxs, []
        else:
            idxs = rng.sample(range(len(redundants)), ratio * num_positive)
            rest_idxs = list(set(all_idxs) ^ set(idxs))
        mk = lambda idx: {"content": text, "result_list": [],  # noqa: E731
                          "prompt": redundants[idx]}
        return [mk(i) for i in idxs], [mk(i) for i in rest_idxs]

    all_relation_examples = []
    if predicate_set:
        positive_examples, negative_examples = [], []
        per_n_ratio = negative_ratio // 3
        for i, text in enumerate(texts):
            negative_example, collects = [], []
            num_positive = len(relation_examples[i])
            redundants1 = inverse_relation_list[i]
            redundants2 = []
            if predicate_list[i]:
                nonentity_list = sorted(
                    set(entity_name_set) ^ set(subject_goldens[i]))
                if schema_lang == "ch":
                    redundants2 = [
                        ne + "的"
                        + predicate_list[i][rng.randrange(len(predicate_list[i]))]
                        for ne in nonentity_list
                    ]
                else:
                    redundants2 = [
                        predicate_list[i][rng.randrange(len(predicate_list[i]))]
                        + " of " + ne for ne in nonentity_list
                    ]
            redundants3 = []
            if subject_goldens[i]:
                non_ent_label_list = sorted(
                    set(entity_label_set) ^ set(entity_prompts[i]))
                if schema_lang == "ch":
                    redundants3 = [
                        subject_goldens[i][rng.randrange(len(subject_goldens[i]))]
                        + "的" + nl for nl in non_ent_label_list
                    ]
                else:
                    redundants3 = [
                        nl + " of "
                        + subject_goldens[i][rng.randrange(len(subject_goldens[i]))]
                        for nl in non_ent_label_list
                    ]
            for redundants in (redundants1, redundants2, redundants3):
                added, rest = add_relation_negatives(
                    redundants, texts[i], num_positive, per_n_ratio)
                negative_example.extend(added)
                collects.extend(rest)
            num_sup = num_positive * negative_ratio - len(negative_example)
            if num_sup > 0 and collects:
                if num_sup > len(collects):
                    idxs = list(range(len(collects)))
                else:
                    idxs = rng.sample(range(0, len(collects)), num_sup)
                for idx in idxs:
                    negative_example.append(collects[idx])
            positive_examples.extend(relation_examples[i])
            negative_examples.extend(negative_example)
        all_relation_examples = positive_examples + negative_examples
    return all_entity_examples, all_relation_examples


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
