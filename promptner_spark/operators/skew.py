"""Explicit skew handling for hot-key aggregation (J3's groupBy side,
SURVEY.md §4.2 "custom salting for the groupBy side, where AQE
skew-join doesn't apply") **[NORTH]**.

Hub surfaces ("united states"-class keys) concentrate a trillion-row
mention stream onto a handful of reducers. Spark's partial aggregation
already combines map-side, which covers algebraic aggregates — but the
technique below matters when the aggregate state is large (collect_*,
exact distinct) or when AQE cannot split a hot reducer. Two phases:

    phase 1: groupBy(key, salt = pmod(xxhash64(row-id), S))
             — S reducers share each hot key;
    phase 2: groupBy(key) over the S partial rows — trivially small.

Deterministic: the salt is a hash of row identity, not a RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    salt_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Generic two-phase aggregation.

    ``aggs`` maps output column → (phase-1 aggregate over raw rows,
    phase-2 aggregate over the partials); e.g. a count is
    ``{"n": (F.count(F.lit(1)), F.sum("n"))}``.
    """
    salt = F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).alias("__salt")
    p1 = df.groupBy(F.col(key), salt).agg(
        *[c1.alias(name) for name, (c1, _c2) in aggs.items()])
    return p1.groupBy(key).agg(
        *[c2.alias(name) for name, (_c1, c2) in aggs.items()])


def hot_surface_counts(mentions: DataFrame, n_salts: int = 16) -> DataFrame:
    """Mentions per normalized surface via the salted two-phase path —
    value-identical to a plain groupBy (the oracle checks this), shape
    robust to a single surface owning most of the stream.

    ``n_docs`` (exact distinct under skew) uses the composite-key
    pattern instead of salting: distinct on (surface, url) first — the
    url component spreads a hot surface across reducers — then a plain
    count per surface over the already-distinct pairs."""
    from .linking import norm_surface

    m = mentions.select(
        norm_surface(F.col("surface")).alias("surface_norm"),
        "url", "sent_id", "mention_id")
    counts = salted_agg(
        m, "surface_norm", ["url", "sent_id", "mention_id"],
        {"n_mentions": (F.count(F.lit(1)).cast("long"),
                        F.sum("n_mentions").cast("long"))},
        n_salts=n_salts,
    )
    docs = (m.select("surface_norm", "url").distinct()
            .groupBy("surface_norm")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
    return counts.join(docs, "surface_norm")
