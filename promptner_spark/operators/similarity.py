"""Similarity search over embeddings (training-data-pipeline operator).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast (small side); candidates stream; the dot
  product is a codegen'd `aggregate(zip_with(...))` fold in index
  order (deterministic summation — reproducible across engines).
- ``lsh_topk``: the scale path — random-hyperplane LSH buckets cut the
  candidate set; hyperplanes are derived from the portable hash so the
  index is deterministic and rebuildable.
- ``embedding_near_pairs``: cosine near-duplicate detection over
  consecutive ids (linear scan pattern for dedup pipelines).

At 100 TB the brute-force path is a broadcast-nested-loop of
|queries| × |corpus| — acceptable only for small query sets; the LSH
path turns it into an equi-join on bucket signature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.hashing import portable_hash


def dot(a: Column, b: Column) -> Column:
    """Index-ordered fold — deterministic float64 summation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (query_id, rank, neighbor_id,
    sim). Excludes self-pairs. Queries broadcast."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 8,
                         table: int = 0) -> Column:
    """Random-hyperplane sign signature as an INT bitmask. Plane
    coefficients are ±1 derived from portable_hash(plane, dim-index) —
    deterministic, no stored model. ``table`` seeds an independent
    plane family (multi-table LSH)."""
    sig = F.lit(0)
    for p in range(n_planes):
        # coef_j = +1 if hash bit else -1;  sign(sum_j coef_j * v_j)
        # (unary lambdas only — a second defaulted param would receive
        # the element index, not the closure value)
        seed = table * 1000 + p

        def coef(j: Column, _s: int = seed) -> Column:
            return (F.pmod(portable_hash(j.cast("string"), _s), F.lit(2))
                    .cast("double") * 2 - 1)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.lit(dim - 1)),
                            (lambda ss: (lambda j: coef(j, ss)))(seed)),
                lambda v, c: v.cast("double") * c,
            ),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 8,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to same-bucket rows,
    then exact cosine rank. Equi-join on (table, signature) — no cross
    join. ``n_tables`` independent plane families OR-amplify recall
    (candidate probability 1-(1-p^planes)^tables): the standard LSH
    recall/cost dial — per-row hash work and candidate volume scale
    linearly with tables, and the join key stays fine-grained so no
    bucket becomes a hub key."""
    def with_buckets(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        sigs = F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     hyperplane_signature(F.col(vec_col), dim, n_planes, t)
                     .alias("bucket"))
            for t in range(n_tables)
        ])
        return df.select(F.col(idc).alias(out_id),
                         F.col(vec_col).alias(f"{out_id}_vec"),
                         F.explode(sigs).alias("tb")) \
            .select(out_id, f"{out_id}_vec",
                    F.col("tb.tbl").alias("tbl"),
                    F.col("tb.bucket").alias("bucket"))

    c = with_buckets(embeddings, id_col, "neighbor_id")
    q = with_buckets(queries, id_col, "query_id")
    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        # a pair can collide in several tables — dedup before ranking
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id",
                cosine(F.col("query_id_vec"), F.col("neighbor_id_vec"))
                .alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "sim"))


def embedding_near_pairs(embeddings: DataFrame, min_sim: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Cosine near-dup over consecutive ids (deterministic linear
    pattern; full near-dup uses lsh buckets + this verify)."""
    a = embeddings.select(F.col(id_col).alias("id_a"),
                          F.col(vec_col).alias("vec_a"))
    b = embeddings.select((F.col(id_col) - 1).alias("id_a"),
                          F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("vec_b"))
    return (
        a.join(b, "id_a")
        .select("id_a", "id_b",
                cosine(F.col("vec_a"), F.col("vec_b")).alias("sim"))
        .where(F.col("sim") >= min_sim)
    )
