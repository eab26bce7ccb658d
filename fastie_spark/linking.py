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
    out_prefix: str, normalize: bool = True, strategy: str = "auto",
    broadcast_threshold: int = 2_000_000,
) -> DataFrame:
    """Left-join df[surface_col] against the prepared dictionary, adding
    ``{out_prefix}_id`` (null = NIL / unlinkable mention).

    Size-adaptive join strategy (the cc.py pattern, cc.py:62-91):

    - ``"broadcast"``: hint-forced broadcast hash join — no shuffle, so
      Zipf-heavy head surfaces cost nothing. Right for real linker
      dictionaries (<= low millions of aliases).
    - ``"shuffle"``: plain equi-join, no hint — Catalyst picks a shuffled
      hash / sort-merge join and AQE's skew-join split (enabled in
      session.py) absorbs head-entity skew on the probe side. The only
      viable plan when the alias table is Wikidata-scale (10^8 rows does
      not broadcast to 1000 executors).
    - ``"auto"`` (default): probe the prepared dict with
      ``limit(threshold+1).count()`` (cheap: the dict is already
      aggregated) and pick broadcast iff it fits. One extra tiny job, and
      the choice is made from evidence instead of hope.
    """
    d = linker_prepared.select(
        F.col("alias_norm"),
        F.col("canonical_id").alias(f"{out_prefix}_id"),
        F.col("prior").alias(f"{out_prefix}_prior"),
    )
    strategy = _resolve_strategy(linker_prepared, strategy,
                                 broadcast_threshold)
    if strategy == "broadcast":
        d = F.broadcast(d)
    elif strategy == "shuffle":
        # explicit hint: a dict that "auto" judged too big must never be
        # silently re-broadcast by Catalyst's own stats; shuffled HASH join
        # (not sort-merge) because the probe side needs no sort and AQE's
        # skew split handles head-entity buckets on both join types
        d = d.hint("shuffle_hash")
    else:
        raise ValueError(f"unknown link strategy: {strategy!r}")
    key = (normalize_surface(F.col(surface_col)) if normalize
           else F.col(surface_col))
    return (
        df.withColumn("__norm", key)
        .join(d, F.col("__norm") == d["alias_norm"], "left")
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


def dense_embeddings(df: DataFrame, surface_col: str) -> DataFrame:
    """(s, v: array<long>[EMB_DIMS]) dense vectors from the sparse
    ``surface_embeddings`` output — absent dims densify to 0, so the
    integers are identical to the sparse formulation and any dot/norm
    computed from them is bit-exact across engines."""
    sp = surface_embeddings(df, surface_col)
    m = sp.groupBy("s").agg(
        F.map_from_entries(F.collect_list(F.struct("dim", "v"))).alias("m")
    )
    vec = F.array(*[
        F.coalesce(F.element_at("m", F.lit(i)), F.lit(0).cast("long"))
        for i in range(EMB_DIMS)
    ])
    return m.select("s", vec.alias("v"))


def _sign_band(start: int, n_bits: int) -> Column:
    """Sign-bit band over dense dims [start, start+n_bits) — the
    axis-aligned random-hyperplane LSH of textops.emb_near_dup
    (textops.py:604), minus the NULL sentinel (dense vectors have none)."""
    return F.concat_ws("", *[
        (F.element_at("v", start + i + 1) > 0).cast("int").cast("string")
        for i in range(n_bits)
    ])


def link_by_embedding(queries: DataFrame, aliases: DataFrame,
                      k: int = 1, prefilter: str = "exact",
                      n_bits: int = EMB_DIMS // 2,
                      exact_threshold: int = 20_000) -> DataFrame:
    """queries(surface) x aliases(alias, canonical_id) -> top-k nearest
    aliases per surface by embedding cosine:
    (surface, alias, canonical_id, cos, rnk).

    Exactness: dot and squared norms are INTEGER sums, so cos =
    dot / sqrt(n2_q * n2_a) is the same IEEE double in every engine —
    ordering (cos DESC, alias ASC) is deterministic and oracle-identical.
    Zero-norm surfaces (gram signs cancel) are unlinkable and dropped.

    Two candidate-generation modes:

    - ``prefilter="exact"``: enumerate every surface x alias pair with a
      broadcast of the alias side. Exact top-k; cost is
      |surfaces| x |aliases| — the small-dictionary mode.
    - ``prefilter="band"``: the 100 TB shape. Candidates are pairs agreeing
      on a sign-bit LSH band over dense dims [0, n_bits) OR
      [n_bits, 2*n_bits) (two redundant bands, the textops.emb_near_dup
      pattern); the integer-exact cosine + top-k runs on colliding pairs
      only. Both joins are plain equi-joins on the band key, so Catalyst
      shuffles (or broadcasts, if one side is small) hash-partitioned by
      band and AQE splits skewed buckets — no cross product anywhere, and
      a 10^8-alias dictionary never needs to broadcast. Recall contract:
      approximate — a true nearest alias whose sign pattern differs from
      the surface in BOTH band windows is not considered (standard LSH
      trade-off; near-identical n-gram profiles agree on almost every
      coordinate sign, so top-1 agreement with exact mode stays high —
      pytest-gated in tests/test_linking_graph.py).
    - ``prefilter="auto"``: probe the distinct alias count
      (``limit(threshold+1).count()`` — the same evidence-based switch as
      link_surfaces' dictionary strategy) and use exact enumeration iff
      the dictionary fits under ``exact_threshold``."""
    if prefilter not in ("exact", "band", "auto"):
        raise ValueError(f"unknown prefilter: {prefilter!r}")
    q = queries.select(F.col("surface")).distinct()
    a = aliases.select("alias", "canonical_id").distinct()
    if prefilter == "auto":
        n = a.limit(exact_threshold + 1).count()
        prefilter = "exact" if n <= exact_threshold else "band"
    if prefilter == "band":
        return _link_by_embedding_banded(q, a, k, n_bits)
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


def _link_by_embedding_banded(q: DataFrame, a: DataFrame, k: int,
                              n_bits: int) -> DataFrame:
    """Banded candidates -> integer-exact verify. See link_by_embedding."""
    n2 = F.aggregate("v", F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    dq = (
        dense_embeddings(q, "surface")
        .select(F.col("s").alias("surface"), F.col("v").alias("vq"),
                n2.alias("n2q"), _sign_band(0, n_bits).alias("b1"),
                _sign_band(n_bits, n_bits).alias("b2"))
        .filter(F.col("n2q") > 0)
    )
    da = (
        dense_embeddings(a.select("alias"), "alias")
        .select(F.col("s").alias("alias"), F.col("v").alias("va"),
                n2.alias("n2a"), _sign_band(0, n_bits).alias("b1"),
                _sign_band(n_bits, n_bits).alias("b2"))
        .filter(F.col("n2a") > 0)
    )

    # ONE equi-join on (band_index, band) over band-exploded sides — the
    # dense-embedding aggregations feed a single join branch instead of
    # being re-evaluated per band (code-review fix), and the join key
    # includes the band index so b1 values never collide with b2 values
    def explode_bands(df: DataFrame, keep: list) -> DataFrame:
        bands = F.explode(F.array(
            F.struct(F.lit(1).alias("bi"), F.col("b1").alias("band")),
            F.struct(F.lit(2).alias("bi"), F.col("b2").alias("band")),
        ))
        return df.select(*keep, bands.alias("bb")).select(
            *keep, F.col("bb.bi").alias("bi"), F.col("bb.band").alias("band")
        )

    cand = (
        explode_bands(dq, ["surface", "vq", "n2q"])
        .join(explode_bands(da, ["alias", "va", "n2a"]), ["bi", "band"])
        .drop("bi", "band")
        .dropDuplicates(["surface", "alias"])
    )
    dot = F.aggregate(
        F.zip_with("vq", "va", lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    scored = (
        cand.join(a, "alias")  # re-attach canonical_id (1:n-safe, like exact)
        .select(
            "surface", "alias", "canonical_id",
            (dot / F.sqrt(F.col("n2q") * F.col("n2a"))).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("surface").orderBy(F.desc("cos"), F.asc("alias"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def _resolve_strategy(prepared: DataFrame, strategy: str,
                      broadcast_threshold: int) -> str:
    """Resolve "auto" ONCE per prepared dictionary so a multi-column link
    (subj + obj) pays a single probe job, not one per joined column."""
    if strategy != "auto":
        return strategy
    n = prepared.limit(broadcast_threshold + 1).count()
    return "broadcast" if n <= broadcast_threshold else "shuffle"


def link_mentions(mentions: DataFrame, linker: DataFrame,
                  normalize: bool = True, strategy: str = "auto",
                  broadcast_threshold: int = 2_000_000) -> DataFrame:
    return link_surfaces(
        mentions, prepare_linker_dict(linker, normalize), "surface", "entity",
        normalize, strategy, broadcast_threshold,
    )


def link_triples(triples: DataFrame, linker: DataFrame,
                 normalize: bool = True, strategy: str = "auto",
                 broadcast_threshold: int = 2_000_000) -> DataFrame:
    prepared = prepare_linker_dict(linker, normalize)
    strategy = _resolve_strategy(prepared, strategy, broadcast_threshold)
    out = link_surfaces(triples, prepared, "subj", "subj", normalize, strategy)
    return link_surfaces(out, prepared, "obj", "obj", normalize, strategy)
