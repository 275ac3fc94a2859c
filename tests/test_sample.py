"""Deterministic sampling (operators/sample.py): partition-layout
independence, the two-phase == naive quota parity (including the
group-smaller-than-quota branch), nested-rate monotonicity, and the
map-only scale contract for rate/mixture sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from promptner_spark.operators.sample import (
    mixture_sample, quota_sample, quota_sample_naive, quota_threshold,
    rate_sample,
)


def _docs(spark, n=400, langs=("en", "de", "fr")):
    rows = [(i, langs[i % len(langs)], f"text {i} " + "w " * (i % 7))
            for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_partition_layout_independence(spark):
    docs = _docs(spark)
    base = {r["doc_id"] for r in
            rate_sample(docs, 0.3, seed=1).select("doc_id").collect()}
    shuffled = {r["doc_id"] for r in
                rate_sample(docs.repartition(7), 0.3, seed=1)
                .select("doc_id").collect()}
    assert base == shuffled and base
    qa = {r["doc_id"] for r in
          quota_sample(docs, "lang", 25, seed=2).select("doc_id").collect()}
    qb = {r["doc_id"] for r in
          quota_sample(docs.repartition(11), "lang", 25, seed=2)
          .select("doc_id").collect()}
    assert qa == qb


def test_two_phase_equals_naive_including_small_groups(spark):
    """Groups both larger and SMALLER than the quota (the keep-all
    threshold branch) must match the single-phase reference plan."""
    docs = _docs(spark, n=90, langs=("en", "en", "en", "de"))  # de ≈ 22
    for quota in (5, 22, 40, 200):
        a = {r["doc_id"] for r in
             quota_sample(docs, "lang", quota, seed=3)
             .select("doc_id").collect()}
        b = {r["doc_id"] for r in
             quota_sample_naive(docs, "lang", quota, seed=3)
             .select("doc_id").collect()}
        assert a == b, quota


def test_quota_counts_exact(spark):
    docs = _docs(spark, n=300)  # 100 per lang
    got = {(r["lang"], r["n"]) for r in
           quota_sample(docs, "lang", 60, seed=4)
           .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == {("en", 60), ("de", 60), ("fr", 60)}
    # quota above every group size keeps everything
    assert quota_sample(docs, "lang", 500, seed=4).count() == 300


def test_nested_rates_are_subsets(spark):
    """hash < thr sampling nests: the 20% sample is contained in the
    50% sample at the same seed — the property that makes rate ramps
    and incremental mixture re-weighting cheap (no resample churn)."""
    docs = _docs(spark)
    s20 = {r["doc_id"] for r in
           rate_sample(docs, 0.2, seed=5).select("doc_id").collect()}
    s50 = {r["doc_id"] for r in
           rate_sample(docs, 0.5, seed=5).select("doc_id").collect()}
    assert s20 < s50
    n = docs.count()
    assert abs(len(s50) / n - 0.5) < 0.15


def test_mixture_rates_respected(spark):
    docs = _docs(spark, n=600)  # 200 per lang
    m = mixture_sample(docs, {"en": 1.0, "de": 0.0, "fr": 0.5},
                       group_col="lang", seed=6)
    by = {r["lang"]: r["n"] for r in
          m.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by.get("en") == 200 and "de" not in by
    assert 60 < by.get("fr", 0) < 140
    # groups absent from the spec drop entirely
    m2 = mixture_sample(docs, {"en": 1.0}, group_col="lang", seed=6)
    assert {r["lang"] for r in m2.select("lang").distinct().collect()} \
        == {"en"}


def test_quota_threshold_caps_and_margins():
    assert quota_threshold(10, 5) == 1.0          # group smaller: keep all
    assert quota_threshold(10, 10) == 1.0
    p = quota_threshold(100, 100_000)
    assert 100 / 100_000 < p < 1.0                # margin above the rate
    assert quota_threshold(1, 2) == 1.0           # cap at 1


def test_rate_sample_is_map_only(spark):
    """Scale contract: rate/mixture sampling adds NO exchange — it is
    a predicate inside the scan stage."""
    docs = _docs(spark)
    for df in (rate_sample(docs, 0.3, seed=7),
               mixture_sample(docs, {"en": 0.5}, seed=7)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
