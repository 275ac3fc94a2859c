"""Link-graph construction (operators/linkgraph.py): the nav outlink
rule round-trips through html parse, salted indegree equals the plain
aggregate, the parse plan is shuffle-free, and PageRank over the page
graph conserves mass and ranks hubs above leaves."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pages(spark, doc_ids):
    from promptner_spark.sources.pages import html_of, url_of

    df = spark.createDataFrame([(d, "en", f"text {d}") for d in doc_ids],
                               ["doc_id", "lang", "text"])
    return df.select(
        url_of(F.col("doc_id")).alias("url"),
        html_of(F.col("doc_id"), F.col("lang"), F.col("text")).alias("html"),
    )


def _expected_links(d: int) -> list[str]:
    # mirror of sources/pages.py's nav rule, hand-maintained
    out = []
    parent, hub = d // 2, d - d % 50
    if d > 0:
        out.append(f"https://ex.com/{parent}")
    if hub != d and hub != parent:
        out.append(f"https://ex.com/{hub}")
    out.append(f"https://cdn{d % 7}.example/a/{d}")
    return out


def test_outlink_rule_roundtrip(spark):
    from promptner_spark.operators.linkgraph import parse_outlinks

    ids = [0, 1, 2, 49, 50, 101, 4999]
    got = {r["url"]: list(r["links"])
           for r in parse_outlinks(_pages(spark, ids)).collect()}
    for d in ids:
        assert got[f"https://ex.com/{d}"] == _expected_links(d), d


def test_extraction_invariant_survives_nav(spark, sf_dir):
    """The nav block sits outside <p>…</p>; the byte-identical text
    extractor must be untouched by it."""
    from promptner_spark.sources.pages import extract_text, synthesize_pages

    pages = synthesize_pages(spark, sf_dir)
    bad = pages.where(
        extract_text(F.col("html")) != F.col("text")).count()
    assert bad == 0


def test_salted_indegree_equals_plain_groupby(spark, sf_dir):
    from promptner_spark.operators.linkgraph import indegree, outlink_edges
    from promptner_spark.sources.pages import synthesize_pages

    edges = outlink_edges(synthesize_pages(spark, sf_dir)) \
        .where(F.col("internal"))
    salted = {(r["dst"], r["indeg"]) for r in indegree(edges).collect()}
    plain = {(r["dst"], r["n"]) for r in
             edges.groupBy("dst").agg(
                 F.count(F.lit(1)).cast("long").alias("n")).collect()}
    assert salted == plain and salted


def test_outlink_parse_plan_is_shuffle_free(spark, sf_dir):
    """The scale contract: href parsing + edge explode ride inside the
    scan stage — no Exchange of any kind in the plan."""
    from promptner_spark.plans.queries import q_outlinks

    plan = q_outlinks(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_link_pagerank_mass_and_hub_ordering(spark, sf_dir):
    from promptner_spark.operators.linkgraph import link_pagerank
    from promptner_spark.sources.pages import synthesize_pages

    ranks = {r["node"]: r["pagerank"] for r in
             link_pagerank(synthesize_pages(spark, sf_dir)).collect()}
    # fixed-point floor division loses < 1e-6 per node per step
    assert abs(sum(ranks.values()) - 1.0) < 2e-6 * len(ranks)
    # hub pages (~50 indegree) must outrank leaf pages (indegree <= 2)
    hub, leaf = ranks["https://ex.com/50"], ranks["https://ex.com/337"]
    assert hub > 3 * leaf, (hub, leaf)
