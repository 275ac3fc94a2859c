"""r6 optimization parity: the flat/codegen rewrites of the text
statistics (arithmetic token counts, regexp_count ratios, the
single-fold n-gram run stats) must be VALUE-IDENTICAL to the r5
higher-order-function formulations on adversarial inputs — the
rewrites exist purely to remove interpreted CodegenFallback work
(guide §4.1), never to change a value the DuckDB oracles pin."""

from __future__ import annotations

from pyspark.sql import functions as F

import promptner_spark.functions.textstats as TS


CASES = [
    "", " ", "  ", "a", "a b", "a  b", " a b ", "the", "the the",
    "the the the", "a an and the of to in is it that", "THE An aNd",
    "İT is", "ΣΟΣ the ΑΣ", "x" * 50, "a.b,c;d", "!@# $%^ &*(",
    "w1 w2 w1 w2 w1", "tab\tsep", "nl\nsep", "\x0bvt",
    "é ü ß İ Σ", "a" + " b" * 200,
    ("the quick brown fox " * 30).strip(),
    "1 22 333 4444", "a-b_c d-e", "  leading", "trailing  ",
    # prefix-stopword bait for the single-pattern rewrite: "a" must
    # not match inside "an"/"ana"/"ait", "an" not inside "and"
    "ait a it", "an and ana", "that thats sthat", "of ofof of",
]


def _old_token_count(t):
    return F.size(F.split(t, " "))


def _old_avg_token_len(t):
    n = _old_token_count(t)
    total = F.aggregate(F.split(t, " "), F.lit(0),
                        lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.greatest(n, F.lit(1))


def _old_stopword_ratio(t):
    stops = F.array(*[F.lit(s) for s in TS.STOP_SUBSET])
    n_stop = F.size(F.filter(
        F.split(t, " "),
        lambda x: F.array_contains(stops, TS.portable_lower(x))))
    return n_stop.cast("double") / F.greatest(_old_token_count(t), F.lit(1))


def _old_punct_ratio(t):
    stripped = F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", "")
    return (F.length(stripped).cast("double")
            / F.greatest(F.length(t), F.lit(1)))


def _old_bpe(t):
    return F.size(F.regexp_extract_all(
        t, F.lit(r"[A-Za-z]{1,8}|[0-9]|[^A-Za-z0-9"
                 + TS.PORTABLE_WS + "]"), 0))


def _old_token_ngrams(t, n):
    # the r5 slice+concat_ws window builder, verbatim
    toks = F.split(t, " ")
    m = F.size(toks)
    return F.when(m < n, F.array(t)).otherwise(
        F.transform(F.sequence(F.lit(1), m - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n))))


def _old_token_shingles(t, k):
    return F.when(F.size(F.split(t, " ")) < k, F.array(t)).otherwise(
        F.array_distinct(_old_token_ngrams(t, k)))


def _old_dup(t, n):
    g = _old_token_ngrams(t, n)
    return (F.size(g) - F.size(F.array_distinct(g))) \
        / F.size(g).cast("double")


def _old_top(t, n):
    # the r5 sorted-run fold, verbatim
    g = F.array_sort(_old_token_ngrams(t, n))
    zero = F.lit(0).cast("int")
    init = F.struct(F.lit("").alias("prev"), zero.alias("run"),
                    zero.alias("best"))

    def step(acc, x):
        run = F.when(x == acc["prev"],
                     acc["run"] + F.lit(1).cast("int")) \
            .otherwise(F.lit(1).cast("int"))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    best = F.aggregate(g, init, step, lambda a: a["best"])
    return best / F.size(g).cast("double")


def test_flat_rewrites_match_hof_forms(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "id long, text string")
    t = F.col("text")
    checks = {
        "token_count": (_old_token_count(t), TS.token_count(t)),
        "avg_token_len": (_old_avg_token_len(t), TS.avg_token_len(t)),
        "stopword_ratio": (_old_stopword_ratio(t), TS.stopword_ratio(t)),
        "punct_ratio": (_old_punct_ratio(t), TS.punct_ratio(t)),
        "bpe": (_old_bpe(t), TS.bpe_ish_token_count(t)),
    }
    from promptner_spark.functions.hashing import token_shingles
    for n in (2, 3):
        s = TS.ngram_run_stats(t, n)
        checks[f"size{n}"] = (F.size(_old_token_ngrams(t, n)), s["total"])
        checks[f"dup{n}"] = (
            _old_dup(t, n),
            (s["total"] - s["distinct"]) / s["total"].cast("double"))
        checks[f"top{n}"] = (
            _old_top(t, n), s["top"] / s["total"].cast("double"))
        # the substring window builders vs the r5 slice+join forms
        checks[f"ngrams{n}"] = (_old_token_ngrams(t, n),
                                TS.token_ngrams(t, n))
        checks[f"shingles{n}"] = (_old_token_shingles(t, n),
                                  token_shingles(t, n))
    checks["shingles13"] = (_old_token_shingles(t, 13),
                            token_shingles(t, 13))

    sel = [F.col("id"), F.col("text")]
    for k, (old, new) in checks.items():
        sel += [old.alias(f"{k}_old"), new.alias(f"{k}_new")]
    for r in df.select(*sel).collect():
        for k in checks:
            assert r[f"{k}_old"] == r[f"{k}_new"], \
                (k, r["text"], r[f"{k}_old"], r[f"{k}_new"])


def test_ngram_run_stats_empty_string_gram_counts_as_run(spark):
    """The fold detects the first element by total==0, not a ''
    sentinel: an empty doc's single empty-string 2-gram must count
    total=1, distinct=1, top=1."""
    df = spark.createDataFrame([("",), ("word",)], ["text"])
    rows = {r["text"]: r for r in df.select(
        "text", TS.ngram_run_stats(F.col("text"), 2).alias("s")).collect()}
    for text in ("", "word"):
        s = rows[text]["s"]
        assert (s["total"], s["distinct"], s["top"]) == (1, 1, 1), text


def test_repetition_fold_evaluated_once_per_n(spark, sf_dir):
    """The two-step select must survive optimization with ONE
    ArrayAggregate per n-gram width (CollapseProject would otherwise
    inline the fold into every derived output column)."""
    from promptner_spark.plans.queries import q_repetition

    plan = q_repetition(spark, sf_dir)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert plan.count("aggregate(array_sort") == 2, plan


def test_small_df_matches_list_path(spark):
    """smalldf.small_df: same rows/schema as the plain list
    createDataFrame for each call-site shape, with a pure-JVM scan
    (no SerializeFromObject-over-Python pickled RDD in the plan)."""
    from promptner_spark import schema
    from promptner_spark.operators.gazetteer import ALIAS_ROWS
    from promptner_spark.smalldf import small_df

    shapes = [
        (ALIAS_ROWS, schema.ALIASES),
        ([(3, 120), (5, 0)], "_bkt long, _off long"),
        ([], "_bkt long, _off long"),
        ([("n1", 0.25), ("n2", 0.75)], "node string, pagerank double"),
    ]
    for rows, sch in shapes:
        got = small_df(spark, rows, sch)
        ref = spark.createDataFrame(rows, schema=sch)
        assert got.schema == ref.schema
        assert sorted(map(tuple, got.collect())) \
            == sorted(map(tuple, ref.collect()))
