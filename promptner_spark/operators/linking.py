"""Entity linking (joins J1-J3, SURVEY.md §2.8) **[NORTH]**.

mention surface → canonical entity, three strategies composed:

1. **Broadcast alias join (J1)** — the alias dictionary is small
   relative to the corpus (millions of rows vs trillions of mentions);
   `F.broadcast` pins a broadcast-hash join so the trillion-row side
   never shuffles.
2. **Salted join (J3)** — hub surfaces ("spark", "united states")
   concentrate in a few keys. For the non-broadcastable fallback path
   the big side gets a `pmod(xxhash64(url), K)` salt and the dictionary
   is exploded ×K, flattening the key histogram. AQE skew-join
   (enabled in session.py) covers the sort-merge case at runtime.
3. **MinHash-LSH candidates (J2)** — surfaces missed by the exact
   alias key are blocked by character-shingle MinHash bands
   (functions/hashing.py) and joined on band buckets, then verified by
   Jaccard; this is a bounded-fanout equi-join, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import schema
from ..functions.hashing import char_shingles, fast_minhash_bands, jaccard
from .gazetteer import ALIAS_ROWS

_PUNCT_CLASS = r"^[!-/:-@\[-`{-~\s]+|[!-/:-@\[-`{-~\s]+$"


def norm_surface(col: F.Column) -> F.Column:
    """The linking key: lowercase + strip surrounding punctuation
    (reference normalization `eval.py:20-21`, oracle/clean.py).

    Deliberately plain F.lower, NOT functions.textstats.portable_lower:
    this key must match the REFERENCE's Python ``str.lower`` (full
    Unicode case mapping), which is what Spark implements. The DuckDB
    oracle mirror applies the simple per-codepoint map, so the two
    engines could disagree on a surface containing U+0130 'İ' or a
    word-final capital sigma — irrelevant for the ASCII gazetteer
    vocabulary the oracles run against, and reference parity wins
    over oracle portability for this key (the text-analytics family,
    which defines its own semantics, makes the opposite choice)."""
    return F.regexp_replace(F.lower(F.trim(col)), _PUNCT_CLASS, "")


def alias_df(spark: SparkSession, vocab_scale: int = 1) -> DataFrame:
    """The alias dictionary; ``vocab_scale > 1`` swaps in the
    vocabulary-scaled variant rows for the scaling bench
    (operators/gazetteer.py::scaled_alias_rows)."""
    from ..smalldf import small_df
    if vocab_scale > 1:
        from .gazetteer import scaled_alias_rows
        return small_df(spark, scaled_alias_rows(vocab_scale),
                        schema=schema.ALIASES)
    return small_df(spark, ALIAS_ROWS, schema=schema.ALIASES)


def link_exact(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """J1: broadcast-hash left join on the normalized surface."""
    return mentions.withColumn("alias_norm_key", norm_surface(F.col("surface"))).join(
        F.broadcast(aliases),
        F.col("alias_norm_key") == aliases["alias_norm"],
        "left",
    ).drop("alias_norm_key")


def link_exact_salted(mentions: DataFrame, aliases: DataFrame, salt: int = 16) -> DataFrame:
    """J3: the same join without broadcast, skew-proofed by salting —
    the strategy used when the dictionary exceeds broadcast memory.
    Big side: salt = pmod(xxhash64(url, sent_id, begin), K); small
    side exploded ×K so every (key, salt) bucket exists."""
    salted_m = mentions.withColumn(
        "alias_norm_key", norm_surface(F.col("surface"))
    ).withColumn(
        "salt",
        F.pmod(F.xxhash64("url", "sent_id", "begin"), F.lit(salt)).cast("int"),
    )
    salted_a = aliases.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_m.join(
        salted_a,
        (F.col("alias_norm_key") == salted_a["alias_norm"])
        & (salted_m["salt"] == salted_a["salt"]),
        "left",
    ).drop("alias_norm_key", "salt")


def link_fuzzy_candidates(
    unlinked: DataFrame,
    aliases: DataFrame,
    n_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """J2: MinHash-LSH candidate generation for surfaces with no exact
    alias hit, verified by true Jaccard. Join key is (band_id,
    band_hash) — bounded fanout, shuffle only on bucket keys.

    The expensive part (shingling + n_hashes minhash permutations) is
    computed once per DISTINCT normalized surface, never per mention
    occurrence — the surface vocabulary is orders of magnitude smaller
    than the mention stream at web scale (Zipf), so this turns an
    O(mentions) hash bill into an O(vocab) one. Output: one best
    candidate per distinct ``m_norm``; callers join it back on the
    norm key.

    ``portable=True`` switches the band-hash family from xxhash64 to
    the md5 family a DuckDB oracle can replay exactly (same firewall
    as :func:`fuzzy_surface_pairs`); the banding is an LSH config, not
    a semantics change, and all work here is O(vocab)."""
    from ..functions.hashing import minhash_bands

    vocab = unlinked.select(
        norm_surface(F.col("surface")).alias("m_norm")).distinct()
    bands_fn = minhash_bands if portable else fast_minhash_bands

    def with_bands(df: DataFrame, col: str, out: str) -> DataFrame:
        sh = char_shingles(F.col(col), shingle_k)
        return df.withColumn(out, bands_fn(sh, n_hashes, band_size))

    m = with_bands(vocab, "m_norm", "m_bands").select(
        "m_norm", F.posexplode("m_bands").alias("band_id", "band_hash"))

    a = with_bands(aliases, "alias_norm", "a_bands").select(
        "alias_norm", "entity_id", "canonical_name",
        F.posexplode("a_bands").alias("band_id", "band_hash"))

    cand = m.join(a, ["band_id", "band_hash"]).dropDuplicates(
        ["m_norm", "entity_id"])
    sim = jaccard(char_shingles(F.col("m_norm"), shingle_k),
                  char_shingles(F.col("alias_norm"), shingle_k))
    return (
        cand.withColumn("jaccard", sim)
        .where(F.col("jaccard") >= min_jaccard)
        # best candidate per surface: highest jaccard, entity_id tiebreak
        .withColumn("rk", F.row_number().over(
            Window.partitionBy("m_norm")
            .orderBy(F.desc("jaccard"), F.asc("entity_id"))))
        .where(F.col("rk") == 1).drop("rk")
    )


def fuzzy_surface_pairs(
    vocab: DataFrame,
    col: str = "m_norm",
    n_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int = 3,
    min_jaccard: float = 0.5,
    portable: bool = False,
) -> DataFrame:
    """Surface-to-surface near-duplicate pairs within a vocabulary:
    char-shingle MinHash band buckets → bounded-fanout band self-join
    → exact Jaccard verify. Output (surf_a < surf_b, jaccard).

    This is the candidate generator for NIL co-reference
    (:func:`~promptner_spark.operators.triples.nil_components`): the
    input is the DISTINCT surface vocabulary, never the mention
    stream, so the whole computation is O(vocab) (Zipf: orders of
    magnitude below the corpus). ``portable=True`` switches to the
    md5 hash family a DuckDB oracle can replay; the default xxhash64
    family is the production path (same firewall as fuzzy linking)."""
    from ..functions.hashing import fast_minhash_bands, minhash_bands

    bands_fn = minhash_bands if portable else fast_minhash_bands
    sh = char_shingles(F.col(col), shingle_k)
    b = vocab.select(
        F.col(col).alias("surf"),
        F.posexplode(bands_fn(sh, n_hashes, band_size))
        .alias("band_id", "digest"))
    x, y = b.alias("x"), b.alias("y")
    cand = (
        x.join(y, ["band_id", "digest"])
        .where(F.col("x.surf") < F.col("y.surf"))
        .select(F.col("x.surf").alias("surf_a"),
                F.col("y.surf").alias("surf_b"))
        .dropDuplicates(["surf_a", "surf_b"])
    )
    sim = jaccard(char_shingles(F.col("surf_a"), shingle_k),
                  char_shingles(F.col("surf_b"), shingle_k))
    return (cand.withColumn("jaccard", sim)
            .where(F.col("jaccard") >= min_jaccard))


def release_caches(df: DataFrame) -> None:
    """Unpersist every cache a linking builder attached to ``df``
    (see :func:`build_resolution`). Call when the result has been
    fully consumed — repeated builder invocations in one session
    (bench loops, notebooks) otherwise accumulate cached relations."""
    for cached in getattr(df, "_promptner_caches", ()):
        cached.unpersist()


def _enrich_resolution(out: DataFrame) -> DataFrame:
    """Vocabulary-side canonicalization: every per-surface derivation
    the KG stages need — canonical ``entity_name``, the stable
    ``entity_key`` (alias id, or the NIL hash-space id for unlinked
    surfaces), and ``eid`` (xxhash64 of the name, the integer that
    rides through the pair-emission shuffle instead of the name
    string) — is computed HERE, on the O(vocab) dictionary, so the
    broadcast join attaches them to the trillion-row mention stream
    for free and the corpus-wide stages never evaluate a regexp or
    md5 per mention (VERDICT r3: piggyback the int dictionary on the
    resolution job instead of a second corpus agg)."""
    from ..functions.hashing import portable_hash
    from .triples import NIL_ID_OFFSET

    ename = F.coalesce(F.col("canonical_name"), F.col("m_norm"))
    return out.withColumn("entity_name", ename).withColumn(
        "entity_key",
        F.when(F.col("entity_id").isNotNull(), F.col("entity_id"))
        .otherwise(NIL_ID_OFFSET
                   + F.pmod(portable_hash(F.col("m_norm")),
                            F.lit(NIL_ID_OFFSET))),
    ).withColumn("eid", F.xxhash64("entity_name"))


def build_resolution(mentions: DataFrame, aliases: DataFrame,
                     fuzzy: bool = True,
                     portable_fuzzy: bool = False) -> DataFrame:
    """Surface-vocabulary resolution dictionary: one row per distinct
    normalized surface, with its resolved entity (exact alias match
    first, MinHash-LSH fuzzy fallback) or NULLs for NIL surfaces.

    Columns: (m_norm, entity_id, canonical_name, alias_norm, prior,
    entity_name, entity_key, eid) — the last three precomputed
    vocabulary-side by :func:`_enrich_resolution`.

    Both internal boundaries are eager localCheckpoints (reclaimed by
    the ContextCleaner when the query's frames drop), so
    ``_promptner_caches`` on the returned DataFrame is empty — kept
    for caller-protocol compatibility (:func:`release_caches`).
    """
    # Materialized eagerly (one vocabulary-sized job): (a) the
    # vocabulary is read by the exact, fuzzy and NIL branches — one
    # distinct pass over the mention stream instead of three; (b) the
    # boundary is a predicate-pushdown barrier — without it Catalyst
    # pushes the fuzzy join's isnotnull(band_hash) condition through
    # the posexplode and BELOW this aggregate, re-evaluating the whole
    # MinHash-band expression on every raw mention row (observed:
    # ~1000× the intended hash work). r6: localCheckpoint instead of
    # persist+count — same one-pass fill, but the AQE broadcast-build
    # jobs hanging off it scan a LogicalRDD instead of resolving the
    # full extraction lineage against the cache manager (the r6 stage
    # audit caught broadcast-side jobs re-running the scan→UDF chain
    # off the persisted form), and downstream actions re-analyze a
    # tiny plan. Blocks are ContextCleaner-reclaimed.
    vocab = mentions.select(
        norm_surface(F.col("surface")).alias("m_norm")).distinct() \
        .localCheckpoint(eager=True)
    exact = vocab.join(F.broadcast(aliases),
                       vocab["m_norm"] == aliases["alias_norm"], "left")
    if not fuzzy:
        exact = _enrich_resolution(exact)
        exact._promptner_caches = ()  # type: ignore[attr-defined]
        return exact
    hit = exact.where(F.col("entity_id").isNotNull())
    miss = exact.where(F.col("entity_id").isNull()).select("m_norm")
    fz = link_fuzzy_candidates(
        miss.withColumnRenamed("m_norm", "surface"), aliases,
        portable=portable_fuzzy,
    ).withColumn("prior", F.lit(None).cast("double")) \
        .select("m_norm", "entity_id", "canonical_name", "alias_norm", "prior")
    # fz (one row per fuzzy-matched surface) is a SUBSET of the
    # resolution dictionary this function returns — which
    # link_mentions broadcasts wholesale onto the mention stream (with
    # the max_broadcast_vocab guard), so broadcasting it here is never
    # the binding constraint. The planner cannot see that: the
    # checkpointed vocab side has no size stats, and without the hint
    # this anti-join planned as a SortMergeJoin (2 exchanges + 2 sorts
    # observed in the r6 flagship audit, for a 7-row right side).
    nil = miss.join(F.broadcast(fz.select("m_norm")),
                    "m_norm", "left_anti").select(
        "m_norm",
        F.lit(None).cast("long").alias("entity_id"),
        F.lit(None).cast("string").alias("canonical_name"),
        F.lit(None).cast("string").alias("alias_norm"),
        F.lit(None).cast("double").alias("prior"),
    )
    out = _enrich_resolution(
        hit.select("m_norm", "entity_id", "canonical_name",
                   "alias_norm", "prior").unionByName(fz).unionByName(nil))
    # Persisted + eagerly filled: the dictionary is read by the main
    # broadcast-back join AND by the (vocab-sized) eid→name dictionary
    # emit_triples uses to reattach names post-aggregation — without
    # the boundary the multi-stage fuzzy chain above would re-run per
    # consumer, each re-run a string of tiny serial stages that dilute
    # scaling (Amdahl) at high parallelism.
    # coalesce BEFORE persisting: the three-way union otherwise caches
    # the SUM of its children's shuffle partitions (3 x
    # shuffle.partitions — 192 near-empty partitions here), and every
    # downstream scan of the cache launches that many tasks (r6 stage
    # audit: three 192-task stages of pure task-launch overhead per
    # flagship run). coalesce is narrow (no exchange); the dictionary
    # is vocabulary-sized, so defaultParallelism partitions is the
    # right ceiling at any scale.
    out = out.coalesce(out.sparkSession.sparkContext.defaultParallelism)
    out = out.localCheckpoint(eager=True)
    out._promptner_caches = ()  # type: ignore[attr-defined]
    return out


def link_mentions(mentions: DataFrame, aliases: DataFrame,
                  fuzzy: bool = True,
                  max_broadcast_vocab: int | None = None,
                  salt: int = 16,
                  portable_fuzzy: bool = False) -> DataFrame:
    """Full linking: exact broadcast join with LSH fuzzy fallback.
    Output adds entity_id / canonical_name (nullable — NIL mentions
    stay unlinked for canonicalization by co-reference).

    Architecture for the trillion-row stream: all per-surface work
    (normalization lookup, MinHash banding, Jaccard verify) happens on
    the DISTINCT surface vocabulary — orders of magnitude smaller than
    the mention stream (Zipf) — producing a resolution dictionary that
    is broadcast back. The mention stream itself is scanned exactly
    once and never shuffled; hub surfaces ("united states") cannot skew
    anything because the join is broadcast-hash, not key-partitioned.

    ``max_broadcast_vocab`` is the broadcast size guard: when set and
    the resolution dictionary exceeds that many rows, the forced
    broadcast (a driver/executor OOM at that point) degrades to the
    salted shuffle join (dictionary exploded ×``salt``, mention side
    salted on row identity) so a pathological vocabulary still links —
    key histogram flattened exactly like :func:`link_exact_salted`.
    ``None`` skips the (vocab-sized) count and always broadcasts."""
    resolution = build_resolution(mentions, aliases, fuzzy=fuzzy,
                                  portable_fuzzy=portable_fuzzy)
    keyed = mentions.withColumn("m_norm_key", norm_surface(F.col("surface")))
    if max_broadcast_vocab is not None and \
            resolution.count() > max_broadcast_vocab:
        salted_m = keyed.withColumn(
            "_salt",
            F.pmod(F.xxhash64("url", "sent_id", "begin"),
                   F.lit(salt)).cast("int"))
        salted_r = resolution.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        out = salted_m.join(
            salted_r,
            (F.col("m_norm_key") == salted_r["m_norm"])
            & (salted_m["_salt"] == salted_r["_salt"]), "left",
        ).drop("m_norm_key", "m_norm", "_salt")
    else:
        out = keyed.join(
            F.broadcast(resolution),
            F.col("m_norm_key") == resolution["m_norm"], "left",
        ).drop("m_norm_key", "m_norm")
    out._promptner_caches = getattr(  # type: ignore[attr-defined]
        resolution, "_promptner_caches", ())
    # The (persisted, vocab-sized) dictionary handle: emit_triples
    # derives its eid→name broadcast from it without a corpus pass.
    out._promptner_resolution = resolution  # type: ignore[attr-defined]
    return out
