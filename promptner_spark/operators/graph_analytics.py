"""Analytics over the emitted entity graph (post-G3 consumers)
**[NORTH]**: PageRank centrality and PMI edge weighting — the two
queries a KG consumer runs first ("which entities matter" / "which
edges are informative vs frequency artifacts").

Both are expressed as pure DataFrame plans:

- :func:`pagerank` — fixed-iteration power method over the symmetrized
  edge set. Each iteration is ONE join (contributions along edges) +
  ONE groupBy (sum per target) — both AQE-managed, hub skew handled
  the same way as every other hot-key agg here. Lineage is truncated
  per iteration (localCheckpoint locally; at cluster scale the
  materialized iteration table). Per-iteration ``round(·, 9)`` pins
  the float trajectory so the result is reproducible bit-for-bit
  across engines and cluster sizes (summation order is the only
  nondeterminism; 9 dp absorbs the last-ulp differences).
- :func:`pmi_edges` — pointwise mutual information per co-occurring
  entity pair: log(p(a,b) / (p(a)p(b))) over document co-occurrence.
  Entity marginals are vocabulary-sized, so they broadcast back onto
  the pair table: the big pair relation is never shuffled twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    n_iter: int = 4,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """(src, dst) undirected edge list → (node, pagerank).

    Fixed ``n_iter`` power iterations (deterministic, oracle-checkable
    — a convergence loop would couple the result to float tolerance).
    The edge list is symmetrized, so every node has degree ≥ 1 and the
    dangling-mass term vanishes; ``n`` (node count) is one count job,
    the same driver-scalar pattern as the components fixpoint test."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    sym = e.unionByName(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).distinct()
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    if n == 0:   # empty graph: empty result, not a division by zero
        return deg.select(F.col("s").alias("node"),
                          F.lit(0.0).alias("pagerank"))
    pr = deg.select(F.col("s").alias("node"),
                    F.lit(1.0 / n).alias("pr"))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (
            sym.join(pr, sym["s"] == pr["node"])
            .join(deg, "s")
            .select(F.col("t").alias("node"),
                    (F.col("pr") / F.col("deg")).alias("c"))
        )
        pr = contrib.groupBy("node").agg(
            F.round(F.lit(base) + F.lit(damping) * F.sum("c"), 9)
            .alias("pr"))
        if checkpoint:
            pr = pr.localCheckpoint(eager=True)
    return pr.select("node", F.round(F.col("pr"), 6).alias("pagerank"))


def pmi_edges(doc_entities: DataFrame, min_docs: int = 2) -> DataFrame:
    """(url, entity_name) distinct doc-entity incidence → PMI-weighted
    co-occurrence edges (subj < obj, n_docs, pmi).

    PMI = ln( (c_ab/T) / ((c_a/T)(c_b/T)) ) with doc-level counts;
    ``min_docs`` drops pairs too rare to score. The pair self-join is
    keyed on url (fine-grained — bounded by per-doc entity count, no
    hub key); both marginal joins broadcast (vocabulary-sized)."""
    ents = doc_entities.select("url", "entity_name").distinct()
    total = max(ents.select("url").distinct().count(), 1)
    marg = ents.groupBy("entity_name").agg(
        F.count(F.lit(1)).alias("c_single"))
    a, b = ents.alias("a"), ents.alias("b")
    pairs = (
        a.join(b, "url")
        .where(F.col("a.entity_name") < F.col("b.entity_name"))
        .groupBy(F.col("a.entity_name").alias("subj"),
                 F.col("b.entity_name").alias("obj"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    return (
        pairs
        .join(F.broadcast(marg.withColumnRenamed("entity_name", "subj")
                          .withColumnRenamed("c_single", "c_a")), "subj")
        .join(F.broadcast(marg.withColumnRenamed("entity_name", "obj")
                          .withColumnRenamed("c_single", "c_b")), "obj")
        .select(
            "subj", "obj", "n_docs",
            F.round(
                F.log((F.col("n_docs").cast("double") * total)
                      / (F.col("c_a").cast("double") * F.col("c_b"))),
                6).alias("pmi"),
        )
    )
