"""E7 human-evaluation harness (reference `eval.py:100-296`): blinded
survey prep, worker assignment invariants, MTurk batch decoding, and
the majority-vote/agreement aggregation quirk."""

from __future__ import annotations

from pyspark.sql import functions as F


def _results(spark):
    rows = []
    for i in range(30):
        perfect = i % 5 == 0
        rows.append((
            "ai" if i % 2 == 0 else "music",
            f"sentence number {i} with entities",
            [f"pred{i}", "shared"],
            [f"gold{i}", "shared"],
            1.0 if perfect else 0.5,
        ))
    return spark.createDataFrame(
        rows, "dataset string, para string, preds array<string>, "
              "entities array<string>, f1 double")


def test_survey_format_blinding_and_sampling(spark):
    from promptner_spark.operators.human_eval import survey_format

    survey = survey_format(_results(spark), defn="D.",
                           examples_per_dataset=8, seed=1).collect()
    real = [r for r in survey if not r["is_attention"]]
    att = [r for r in survey if r["is_attention"]]
    assert len(att) > 0 and all(r["id"] == -1 for r in att)
    assert all(r["f1"] == 1.0 for r in att)
    # per-dataset cap honored
    for ds in ("ai", "music"):
        assert sum(r["dataset"] == ds for r in real) <= 8
    # blinding: gptlist records where the model list went
    for r in real:
        model = r["list1"] if r["gptlist"] == 1 else r["list2"]
        assert "pred" in model
    # both orders occur (seeded hash flip, not a constant)
    assert {r["gptlist"] for r in real} == {1, 2}
    # ids unique among real rows
    ids = [r["id"] for r in real]
    assert len(set(ids)) == len(ids)
    # deterministic across invocations
    again = survey_format(_results(spark), defn="D.",
                          examples_per_dataset=8, seed=1).collect()
    assert sorted(map(tuple, survey)) == sorted(map(tuple, again))


def test_assign_workers_invariants(spark):
    from promptner_spark.operators.human_eval import (
        assign_workers, survey_format)

    survey = survey_format(_results(spark), defn="D.",
                           examples_per_dataset=8, seed=1)
    assigned = assign_workers(survey, n_workers=5, workers_per_example=3,
                              n_attentions=2).collect()
    real = [r for r in assigned if not r["is_attention"]]
    by_ex = {}
    for r in real:
        by_ex.setdefault(r["id"], []).append(r["worker"])
    for ex, workers in by_ex.items():
        assert len(workers) == 3 and len(set(workers)) == 3, ex
    # balanced load: ±workers_per_example per worker
    loads = [sum(r["worker"] == w for r in real) for w in range(5)]
    assert max(loads) - min(loads) <= 3
    # every worker gets exactly 2 attention checks
    att = [r for r in assigned if r["is_attention"]]
    for w in range(5):
        assert sum(r["worker"] == w for r in att) == 2


def test_decode_turk_batch(spark):
    from promptner_spark.operators.human_eval import decode_turk_batch

    df = spark.createDataFrame(
        [("h1", "w1", "s", 1, 2)],
        ["HITId", "WorkerId", "`Input.sentence`", "`Answer.l1correct`",
         "`Answer.better`"])
    df = df.toDF("HITId", "WorkerId", "Input.sentence",
                 "Answer.l1correct", "Answer.better")
    out = decode_turk_batch(df)
    assert set(out.columns) == {"sentence", "l1correct", "better"}
    assert out.collect()[0]["l1correct"] == 1


def test_aggregate_and_analyze_judgments(spark):
    from promptner_spark.operators.human_eval import (
        aggregate_judgments, analyze_judgments)

    # survey: example 0 has the model list as list2 (gptlist=2)
    survey = spark.createDataFrame(
        [(0, 2, 0.5, "ai"), (1, 1, 0.5, "music")],
        "id int, gptlist int, f1 double, dataset string")
    # three workers judge example 0; two judge example 1
    responses = spark.createDataFrame(
        [
            # id, worker, l1correct, l2correct, better, l1missing,
            # l2missing, l1extra, l2extra
            (0, 0, 1, 1, 2, None, "a,b", None, None),
            (0, 1, 1, 0, 2, "x", None, None, "y"),
            (0, 2, 1, 1, 1, None, None, None, None),
            (1, 0, 1, 0, 1, None, None, None, None),
            (1, 1, 0, 0, 2, None, None, None, None),
        ],
        "id int, worker int, l1correct int, l2correct int, better int, "
        "l1missing string, l2missing string, l1extra string, l2extra string")
    per_ex = {r["id"]: r for r in
              aggregate_judgments(survey, responses).collect()}

    ex0 = per_ex[0]   # gpt list is list2
    assert ex0["num"] == 3
    # gptcorrect votes = l2correct = [1, 0, 1] -> mode 1, agreement 0.5
    assert ex0["gptcorrect"] == 1 and ex0["gptcorrect_agreement"] == 0.5
    # truecorrect votes = l1correct = [1, 1, 1] -> mode 1, agreement 1
    assert ex0["truecorrect"] == 1 and ex0["truecorrect_agreement"] == 1.0
    # better==gptno(2) votes = [1, 1, 0] -> gptbetter 1, agreement 0.5
    assert ex0["gptbetter"] == 1 and ex0["gptbetter_agreement"] == 0.5
    # gptmissing = mean(len(l2missing)) = (2 + 0 + 0)/3
    assert abs(ex0["gptmissing"] - 2 / 3) < 1e-9
    assert abs(ex0["gptextra"] - 1 / 3) < 1e-9

    ex1 = per_ex[1]   # gpt list is list1, two judges
    # gptcorrect votes = l1correct = [1, 0]: tie -> mode 0 (pinned),
    # two disagreeing judgments -> agreement 0 (`eval.py:247-250`)
    assert ex1["gptcorrect"] == 0 and ex1["gptcorrect_agreement"] == 0.0

    summary = {r["dataset"]: r for r in
               analyze_judgments(aggregate_judgments(
                   survey, responses)).collect()}
    assert set(summary) == {"All", "ai", "music"}
    assert summary["ai"]["truecorrect"] == 1.0
    assert summary["All"]["num"] if "num" in summary["All"] else True
