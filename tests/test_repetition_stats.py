"""Gopher-style repetition signals (functions/textstats.py): the
in-row sorted-run formulation must equal hand-computed multiset
statistics on edge cases, and the plan must stay shuffle-free."""

from __future__ import annotations

from pyspark.sql import functions as F


CASES = [
    # (text, dup2, top2, n2) hand-computed over 2-gram multisets
    ("a b a b a", 2 / 4, 2 / 4, 4),       # grams: ab,ba,ab,ba
    ("a a a a", 2 / 3, 3 / 3, 3),         # aa,aa,aa
    ("a b c d", 0.0, 1 / 3, 3),           # all distinct
    ("solo", 0.0, 1.0, 1),                # < n tokens → [text]
    ("x y", 0.0, 1.0, 1),                 # exactly n tokens
]


def test_repetition_fractions_hand_cases(spark):
    from promptner_spark.functions import textstats as TS

    df = spark.createDataFrame([(t,) for t, *_ in CASES], ["text"])
    got = df.select(
        "text",
        TS.dup_ngram_fraction(F.col("text"), 2).alias("dup2"),
        TS.top_ngram_fraction(F.col("text"), 2).alias("top2"),
        F.size(TS.token_ngrams(F.col("text"), 2)).alias("n2"),
    ).collect()
    by_text = {r["text"]: r for r in got}
    for text, dup2, top2, n2 in CASES:
        r = by_text[text]
        assert abs(r["dup2"] - dup2) < 1e-12, text
        assert abs(r["top2"] - top2) < 1e-12, text
        assert r["n2"] == n2, text


def test_repetition_query_has_no_key_shuffle(spark, sf_dir):
    """The scale contract: per-doc repetition stats are map-only — no
    hashpartitioning Exchange anywhere in the plan (the oracle's
    explode+groupBy closed form is what the engine explicitly
    avoids). The only allowed Exchange is _docs_spread's round-robin
    splits-starvation repair, which moves each row once and carries
    no key."""
    from promptner_spark.plans.queries import q_repetition

    plan = q_repetition(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line
    assert "hashpartitioning" not in plan
