"""Entity linking: normalized broadcast-dictionary join (north_rule stage 3).

Not present in the reference (FastIE stops at per-document extraction —
SURVEY.md §0); semantics specified by SURVEY.md §7.1 step 7:

- surface normalization = ``dbc2sbc`` full-width -> half-width
  (/root/reference/fastie/models/uie/decode_utils.py:118-130) + lowercase.
  dbc2sbc is expressed JVM-side with ``translate`` over the 94-char
  full-width block (U+3000 deliberately unmapped, matching the reference
  quirk) — no UDF, stays in codegen.
- the linker dictionary is pre-aggregated to one best row per normalized
  alias (highest prior, then smallest canonical_id — deterministic), so the
  join is 1:<=1 and needs no post-join window.
- dictionary side is broadcast (linker dicts are small relative to
  mentions); a broadcast hash join has no shuffle and therefore no skew
  problem on the probe side — Zipf-heavy head entities cost nothing extra.
  Skew handling (AQE skew-join + salting) is reserved for the shuffling
  self-joins in cc.py where it actually matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FW_SRC = "".join(chr(c + 0xFEE0) for c in range(0x21, 0x7F))
_FW_DST = "".join(chr(c) for c in range(0x21, 0x7F))


def normalize_surface(col: Column) -> Column:
    """dbc2sbc + lower, as a codegen-friendly expression. Exactly matches
    decoders.dbc2sbc (decode_utils.py:118-130) including its quirk: U+3000
    (ideographic space) stays UNMAPPED, so a linker surface and a decode
    surface normalize identically."""
    return F.lower(F.translate(col, _FW_SRC, _FW_DST))


def prepare_linker_dict(linker: DataFrame, normalize: bool = True) -> DataFrame:
    """One best (canonical_id, entity_type, prior) per (normalized) alias.
    normalize=False keeps exact surface matching — used when the dictionary
    is already surface-exact (e.g. the derived vocab, whose SQL oracle
    assigns ids per raw token and must not see normalization collisions)."""
    key = normalize_surface(F.col("alias")) if normalize else F.col("alias")
    return (
        linker.withColumn("alias_norm", key)
        .groupBy("alias_norm")
        .agg(
            F.expr(
                "min_by(struct(canonical_id, entity_type, prior), "
                "struct(-prior, canonical_id))"
            ).alias("best")
        )
        .select(
            "alias_norm",
            F.col("best.canonical_id").alias("canonical_id"),
            F.col("best.entity_type").alias("entity_type"),
            F.col("best.prior").alias("prior"),
        )
    )


def link_surfaces(
    df: DataFrame, linker_prepared: DataFrame, surface_col: str,
    out_prefix: str, normalize: bool = True,
) -> DataFrame:
    """Left broadcast-join df[surface_col] against the prepared dictionary,
    adding ``{out_prefix}_id`` (null = NIL / unlinkable mention)."""
    d = linker_prepared.select(
        F.col("alias_norm"),
        F.col("canonical_id").alias(f"{out_prefix}_id"),
        F.col("prior").alias(f"{out_prefix}_prior"),
    )
    key = (normalize_surface(F.col(surface_col)) if normalize
           else F.col(surface_col))
    return (
        df.withColumn("__norm", key)
        .join(F.broadcast(d), F.col("__norm") == d["alias_norm"], "left")
        .drop("alias_norm", "__norm")
    )


def link_mentions(mentions: DataFrame, linker: DataFrame,
                  normalize: bool = True) -> DataFrame:
    return link_surfaces(
        mentions, prepare_linker_dict(linker, normalize), "surface", "entity",
        normalize,
    )


def link_triples(triples: DataFrame, linker: DataFrame,
                 normalize: bool = True) -> DataFrame:
    prepared = prepare_linker_dict(linker, normalize)
    out = link_surfaces(triples, prepared, "subj", "subj", normalize)
    return link_surfaces(out, prepared, "obj", "obj", normalize)
