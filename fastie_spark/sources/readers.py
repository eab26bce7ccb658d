"""JSONL corpus readers for the reference's dataset formats (SURVEY.md §2.1
S1/S2, FIXTURES.md §2-6) with explicit schemas (no inference — a schema scan
over TBs of jsonl is a full extra pass) and sorted-distinct label-universe
discovery (A5: collected to the driver and broadcast, the reference's own
pattern — fastie/data/named_entity_recognition.py:60-62,
relation_extraction.py:103-105, event_extraction.py:43-50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NER_DDL = (
    "text string, entities array<struct<id:long, entity:string, "
    "start_offset:long, end_offset:long, label:string>>"
)
RE_DDL = (
    "text string, spo_list array<struct<predicate:string, subject:string, "
    "object:string, subject_type:string, object_type:string>>"
)
EVENT_DDL = (
    "text string, id string, event_list array<struct<event_type:string, "
    "trigger:string, trigger_start_index:long, "
    "arguments:array<struct<argument_start_index:long, role:string, "
    "argument:string, alias:array<string>>>, class:string>>"
)
EVENT_SCHEMA_DDL = (
    "event_type string, role_list array<struct<role:string>>, id string, "
    "class string"
)
UIE_DDL = (
    "content string, result_list array<struct<text:string, start:long, "
    "end:long>>, prompt string"
)
CLS_DDL = "text string, label string"


def read_ner(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(NER_DDL).json(path)


def read_re(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(RE_DDL).json(path)


def read_events(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(EVENT_DDL).json(path)


def read_uie(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(UIE_DDL).json(path)


def read_classification(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CLS_DDL).json(path)


# ---- label-universe discovery (sorted distinct -> driver -> broadcast) ----
def ner_labels(df: DataFrame) -> list:
    rows = (
        df.select(F.explode("entities").alias("e"))
        .select("e.label").distinct().orderBy("label").collect()
    )
    return [r["label"] for r in rows]


def re_predicates(df: DataFrame) -> list:
    rows = (
        df.select(F.explode("spo_list").alias("s"))
        .select("s.predicate").distinct().orderBy("predicate").collect()
    )
    return [r["predicate"] for r in rows]


def event_labels_from_schema(spark: SparkSession, schema_path: str) -> list:
    """Schema-file scan (S2): '{event_type}@{role}' with the synthetic
    trigger role prepended per type (event_extraction.py:43-50)."""
    df = spark.read.schema(EVENT_SCHEMA_DDL).json(schema_path)
    labels = []
    for r in df.collect():
        t = r["event_type"]
        for role in ["触发词"] + [x["role"] for x in (r["role_list"] or [])]:
            labels.append(f"{t}@{role}")
    return sorted(labels)


def cls_labels(df: DataFrame) -> list:
    rows = df.select("label").distinct().orderBy("label").collect()
    return [r["label"] for r in rows]
