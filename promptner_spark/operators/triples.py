"""Canonicalization + (subj, pred, obj) triple emission
(operators G1, G3 — SURVEY.md §2.9) **[NORTH]**.

Semantics (deterministic, dependency-free — the reference has no
relation extractor, so the north-rule triple emission is co-occurrence
based):

- **nodes**: one canonical entity per linked cluster. Linked mentions
  carry their alias ``entity_id``; NIL mentions are canonicalized by
  connected components over the "same normalized surface" relation
  (G2), giving surface-cluster ids offset into a disjoint id space.
- **edges/triples**: within each sentence, every unordered pair of
  distinct canonical entities co-occurring emits
  ``(subj, 'cooccurs_with', obj)`` with ``subj < obj`` (canonical-name
  order) — plus provenance (url, sent_id).

Scale: pair generation is a per-sentence self-join on (url, sent_id).
Sentences hold O(10) mentions so fanout is bounded; the join key is
fine-grained (url × sent) — no hub-key blowup. Triple dedup/counting
shuffles once on (subj, pred, obj).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PRED_COOCCUR = "cooccurs_with"
NIL_ID_OFFSET = 1_000_000_000


def nil_components(linked: DataFrame, min_jaccard: float = 0.5,
                   shingle_k: int = 3,
                   portable: bool = False) -> DataFrame:
    """Cross-surface NIL co-reference (north_star "connected-components
    canonicalization over the mention co-reference graph"): cluster
    the NIL surface VOCABULARY by char-shingle similarity and map each
    surface to its component representative (the component's minimum
    surface — stable across cluster sizes).

    Output: (m_norm, canonical_rep), one row per distinct NIL surface;
    vocabulary-sized, so callers broadcast it back onto the mention
    stream. Surfaces with no near-duplicate keep themselves."""
    from .components import connected_components
    from .linking import fuzzy_surface_pairs, norm_surface

    nil_vocab = (linked.where(F.col("entity_id").isNull())
                 .select(norm_surface(F.col("surface")).alias("m_norm"))
                 .distinct())
    pairs = fuzzy_surface_pairs(nil_vocab, col="m_norm",
                                shingle_k=shingle_k,
                                min_jaccard=min_jaccard,
                                portable=portable)
    comp = connected_components(
        pairs.select(F.col("surf_a").alias("src"),
                     F.col("surf_b").alias("dst")))
    return (
        nil_vocab.join(comp.withColumnRenamed("node", "m_norm"),
                       "m_norm", "left")
        .select("m_norm",
                F.coalesce("component", "m_norm").alias("canonical_rep"))
    )


def canonicalize(linked: DataFrame, nil_merge: bool = False,
                 min_jaccard: float = 0.5) -> DataFrame:
    """linked mention table → + canonical (entity_key, entity_name).

    Linked mentions use their alias entity. NIL mentions get a
    deterministic id from the normalized surface hash-space (same
    surface ⇒ same id); with ``nil_merge`` near-duplicate NIL surfaces
    are first merged by :func:`nil_components` (broadcast of the
    vocabulary-sized representative map — the mention stream still
    never shuffles).

    When the input already carries (entity_key, entity_name) — the
    linking dictionary precomputed them vocabulary-side
    (linking._enrich_resolution) — this is a no-op: the corpus-wide
    stream pays zero per-row regexp/hash work here."""
    from ..functions.hashing import portable_hash
    from .linking import norm_surface

    if not nil_merge and {"entity_key", "entity_name"} <= set(linked.columns):
        return linked
    # nil_merge rewrites NIL names/keys, so any precomputed columns
    # (and the eid derived from the un-merged name) are stale.
    linked = linked.drop("entity_key", "entity_name", "eid")
    nrm = norm_surface(F.col("surface"))
    if nil_merge:
        reps = nil_components(linked, min_jaccard=min_jaccard)
        linked = linked.withColumn("__nrm", nrm).join(
            F.broadcast(reps.withColumnRenamed("m_norm", "__nrm")),
            "__nrm", "left")
        canon_surface = F.coalesce(F.col("canonical_rep"), F.col("__nrm"))
    else:
        canon_surface = nrm
    out = linked.withColumn(
        "entity_key",
        F.when(F.col("entity_id").isNotNull(), F.col("entity_id"))
        .otherwise(NIL_ID_OFFSET
                   + F.pmod(portable_hash(canon_surface),
                            F.lit(NIL_ID_OFFSET))),
    ).withColumn(
        "entity_name",
        F.coalesce(F.col("canonical_name"), canon_surface),
    )
    return out.drop("__nrm", "canonical_rep") if nil_merge else out


def nodes_table(canonical: DataFrame) -> DataFrame:
    """Canonical entity (nodes) table with mention counts."""
    return canonical.groupBy("entity_key", "entity_name").agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.min("type").alias("type"),
    )


def emit_triples(canonical: DataFrame,
                 name_dict: DataFrame | None = None) -> DataFrame:
    """Sentence-scoped co-occurrence pairs → triples table
    (schema.TRIPLES). ``subj < obj`` by canonical name for a stable
    orientation.

    ONE shuffle: ``groupBy(url, sent_id).collect_set`` gathers the
    distinct entities per sentence, and the (i < j) pairs are
    generated in-row from the sorted set (nested transform + flatten)
    — no distinct pass and no self-join. Fanout is bounded by
    per-sentence entity count (O(10)), so the generated array never
    blows a row; at web scale this halves the exchanges of the
    equivalent distinct+self-join plan and cannot skew (the key is the
    fine-grained sentence, never the entity).

    ``name_dict`` (vocabulary-sized rows of (eid, entity_name), e.g.
    derived from the linking resolution dictionary) enables the
    narrow-shuffle variant: when the input also carries ``eid``
    (xxhash64 of the canonical name, precomputed vocabulary-side by
    the linking dictionary), the collect_set / pair Generate move
    8-byte longs instead of name strings, and names are reattached
    AFTER aggregation by two broadcast-hash joins against the
    dictionary — orientation restored with least/greatest. Same rows
    out; the corpus-wide exchange carries a fraction of the bytes,
    which is what the memory-bandwidth-bound reduce stage scales
    with. Without ``name_dict`` (or when ``eid`` is absent) the
    string plan runs — the DuckDB-oracle-replayable form."""
    if name_dict is not None and "eid" in canonical.columns:
        return _emit_triples_keyed(canonical, name_dict)
    from .graph_analytics import explode_pairs
    sets = canonical.groupBy("url", "sent_id").agg(
        F.sort_array(F.collect_set("entity_name")).alias("ents"))
    # pair emission via two chained Generates (explode_pairs) rather
    # than the nested transform/flatten expression: identical pair
    # set, but GenerateExec is whole-stage-codegen'd while
    # higher-order functions are CodegenFallback — interpreted per
    # row, and this was the KG reduce stage's CPU hog (r6; same
    # rationale as _emit_triples_keyed's docstring).
    return (
        explode_pairs(
            sets.select("url",
                        F.col("sent_id").cast("int").alias("sent_id"),
                        "ents"),
            "ents", "subj", "obj", carry=("url", "sent_id"))
        .select(
            "subj",
            F.lit(PRED_COOCCUR).alias("pred"),
            "obj",
            "url", "sent_id",
        )
    )


def _emit_triples_keyed(canonical: DataFrame,
                        name_dict: DataFrame) -> DataFrame:
    """Long-keyed pair emission (see :func:`emit_triples`): distinct
    eids per sentence through the exchange, unordered (i < j by eid)
    pairs in-row, names reattached post-explode by broadcast and the
    subj < obj (by name) orientation applied last. eid↔name is a
    bijection up to a 64-bit hash collision within the entity
    vocabulary — negligible at any real vocabulary size and absent at
    test scale (the parity test asserts exact equality with the
    string plan).

    Unlike the string plan's nested transform/flatten (higher-order
    functions are CodegenFallback — interpreted per row, measured as
    the KG reduce stage's CPU hog), the pairs here come from two
    chained ``explode``s (GenerateExec, whole-stage codegen): element
    i paired with every element after it via ``slice``. No
    ``sort_array`` either — the pair set is order-independent and the
    subj/obj orientation is applied by name at the end."""
    sets = canonical.groupBy("url", "sent_id").agg(
        F.collect_set("eid").alias("ents"))
    s1 = (
        sets.where(F.size("ents") >= 2)
        .select("url", F.col("sent_id").cast("int").alias("sent_id"),
                "ents", F.posexplode("ents").alias("i", "ea"))
    )
    exploded = s1.select(
        "url", "sent_id", "ea",
        F.explode(F.slice("ents", F.col("i") + 2, F.size("ents")))
        .alias("eb"),
    )
    d = name_dict.select(F.col("eid").alias("_k"),
                         F.col("entity_name").alias("_n"))
    na = exploded.join(F.broadcast(d), F.col("ea") == F.col("_k")) \
        .withColumnRenamed("_n", "name_a").drop("_k")
    nb = na.join(F.broadcast(d), F.col("eb") == F.col("_k")) \
        .withColumnRenamed("_n", "name_b").drop("_k")
    return nb.select(
        F.least("name_a", "name_b").alias("subj"),
        F.lit(PRED_COOCCUR).alias("pred"),
        F.greatest("name_a", "name_b").alias("obj"),
        "url", "sent_id",
    )


def triple_counts(triples: DataFrame) -> DataFrame:
    """Corpus-level aggregated edge weights (one shuffle)."""
    return triples.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_sents"),
        F.countDistinct("url").alias("n_docs"),
    )


def predicate_triples(
    mentions: DataFrame,
    name_col: str = "surface",
    max_gap: int = 3,
    connector_vocab: tuple[str, ...] | None = None,
) -> DataFrame:
    """Surface-pattern predicate extraction (ReVerb-style, lexical):
    for each pair of POSITIONALLY ADJACENT mentions in a sentence, the
    tokens strictly between them become the predicate when the gap is
    1..``max_gap`` tokens — emitting ``(subj, connector, obj)`` with
    real lexical predicates instead of the generic ``cooccurs_with``.

    Input must carry (url, sent_id, begin, end, <name_col>, text) —
    the fused extractor's ``carry=("text",)`` provides text without a
    join. ``connector_vocab`` optionally restricts predicates to a
    closed relation lexicon (a POS gate would slot in the same place
    for a natural corpus).

    Plan shape: ONE shuffle — groupBy(sentence) collects the mention
    structs, array_sort orders them by position in-row, and the
    adjacent-pair + token-slice generation is pure codegen'd array
    work (transform/filter/slice); fanout is bounded by per-sentence
    mention count. Same scale discipline as :func:`emit_triples`."""
    ents = mentions.groupBy("url", "sent_id", "text").agg(
        F.array_sort(
            F.collect_list(F.struct("begin", "end",
                                    F.col(name_col).alias("name")))
        ).alias("ms"))
    toks = F.split(F.col("text"), " ")
    n = F.size("ms")
    # adjacent pairs via ONE Generate (posexplode of the first n-1
    # mentions) + element_at for the successor, instead of the
    # filter(transform(...)) expression — higher-order functions are
    # CodegenFallback (interpreted per row) while GenerateExec and
    # element_at are whole-stage-codegen'd (r6; same rewrite as the
    # pair emission in emit_triples/graph_analytics.explode_pairs).
    # Same pair set: a = ms[i], b = ms[i+1], gap-gated.
    exploded = (
        ents.where(n >= 2)
        .select("url", F.col("sent_id").cast("int").alias("sent_id"),
                toks.alias("toks"), "ms",
                F.posexplode(F.slice(F.col("ms"), 1, n - 1))
                .alias("__i", "a"))
        .withColumn("b", F.element_at(F.col("ms"), F.col("__i") + 2))
    )
    gap = F.col("b.begin") - F.col("a.end")
    out = (
        exploded.where((gap >= 1) & (gap <= max_gap))
        .select(
            F.col("a.name").alias("subj"),
            F.array_join(
                F.slice(F.col("toks"), F.col("a.end") + 1,
                        F.col("b.begin") - F.col("a.end")),
                "_").alias("pred"),
            F.col("b.name").alias("obj"),
            "url", "sent_id",
        )
    )
    if connector_vocab is not None:
        out = out.where(F.col("pred").isin(*connector_vocab))
    return out
