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


# ---------------------------------------------------------------------------
# Embedding linking — the "+embedding" half of the north_star's
# "dictionary+embedding entity linking": surfaces the exact-match dictionary
# misses (typos, variants, transliteration drift) are linked to the
# nearest alias by n-gram feature-hash embedding cosine.
# ---------------------------------------------------------------------------
EMB_DIMS = 16


def surface_embeddings(df: DataFrame, surface_col: str) -> DataFrame:
    """(s, dim, v) sparse integer embeddings: every 3-gram of the surface
    (the whole surface when len < 3) hashes to dim = index of md5(gram)'s
    FIRST hex char in '0123456789abcdef' (16 dims) with contribution +1 if
    the SECOND hex char < '8' else -1; v = the per-dim sum. All-integer, so
    any engine reproduces the vectors bit-exactly (the DuckDB oracle in
    __spark_entry__ mirrors this formula 1:1). Stays relational: explode ->
    sum — at corpus scale the input should be the DISTINCT surface set."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({surface_col}) - 2, 1)), "
        f"i -> CASE WHEN length({surface_col}) >= 3 "
        f"THEN substring({surface_col}, i, 3) ELSE {surface_col} END)"
    )
    g = df.select(F.col(surface_col).alias("s"), F.explode(grams).alias("g"))
    return (
        g.select(
            "s",
            F.expr("locate(substring(md5(g), 1, 1), '0123456789abcdef') - 1")
            .alias("dim"),
            F.when(F.expr("substring(md5(g), 2, 1)") < "8", F.lit(1))
            .otherwise(F.lit(-1)).alias("sgn"),
        )
        .groupBy("s", "dim")
        .agg(F.sum("sgn").cast("long").alias("v"))
    )


def link_by_embedding(queries: DataFrame, aliases: DataFrame,
                      k: int = 1) -> DataFrame:
    """queries(surface) x aliases(alias, canonical_id) -> top-k nearest
    aliases per surface by embedding cosine:
    (surface, alias, canonical_id, cos, rnk).

    Exactness: dot and squared norms are INTEGER sums, so cos =
    dot / sqrt(n2_q * n2_a) is the same IEEE double in every engine —
    ordering (cos DESC, alias ASC) is deterministic and oracle-identical.
    Zero-norm surfaces (gram signs cancel) are unlinkable and dropped.

    Scale shape: both sides here are dictionary-/distinct-surface-sized, so
    the pair enumeration broadcasts the alias side. For multi-million-alias
    dictionaries, prefilter candidates with the sign-band LSH pattern
    (textops.emb_near_dup) and run this verify on the colliding pairs."""
    q = queries.select(F.col("surface")).distinct()
    a = aliases.select("alias", "canonical_id").distinct()
    eq = surface_embeddings(q, "surface")
    ea = surface_embeddings(a, "alias")
    n2q = eq.groupBy("s").agg(F.sum(F.col("v") * F.col("v")).alias("n2q"))
    n2a = ea.groupBy("s").agg(F.sum(F.col("v") * F.col("v")).alias("n2a"))
    dots = (
        eq.alias("q")
        .join(F.broadcast(ea.alias("a")), F.col("q.dim") == F.col("a.dim"))
        .groupBy(F.col("q.s").alias("qs"), F.col("a.s").alias("as_"))
        .agg(F.sum(F.col("q.v") * F.col("a.v")).cast("long").alias("dot"))
    )
    pairs = (
        q.select(F.col("surface"))
        .crossJoin(F.broadcast(a))
        .join(
            dots,
            (F.col("surface") == F.col("qs")) & (F.col("alias") == F.col("as_")),
            "left",
        )
        .join(n2q.select(F.col("s").alias("surface"), "n2q"), "surface")
        .join(F.broadcast(n2a.select(F.col("s").alias("alias"), "n2a")), "alias")
        .filter((F.col("n2q") > 0) & (F.col("n2a") > 0))
        .select(
            "surface", "alias", "canonical_id",
            (F.coalesce(F.col("dot"), F.lit(0))
             / F.sqrt(F.col("n2q") * F.col("n2a"))).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("surface").orderBy(F.desc("cos"), F.asc("alias"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
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
