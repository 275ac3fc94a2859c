"""Human-evaluation harness (operator E7 — reference `eval.py:100-296`).

The reference prepares blinded MTurk survey CSVs from evaluation
results and aggregates worker judgments back into per-example majority
votes and agreement scores. Re-expressed Spark-first and DETERMINISTIC
(seeded hashes replace `random.random`/`np.random` so reruns and
resumes produce identical surveys):

- :func:`survey_format` — blinded survey rows (`eval.py:110-148`
  ``get_survey_format``): drop 85% of perfect-F1 rows (they become
  attention checks), shuffle-free blinding via a seeded hash flip
  (``gptlist`` records which list is the model's), per-dataset
  capped sampling.
- :func:`assign_workers` — each example replicated to
  ``workers_per_example`` distinct workers with balanced load
  (`eval.py:158-172`'s greedy capacity loop becomes a deterministic
  round-robin on the example's rank — same invariants: k distinct
  workers per example, ±1 balanced assignments per worker), plus
  ``n_attentions`` perfect-F1 attention checks per worker.
- :func:`decode_turk_batch` — strip the MTurk platform metadata
  columns and the ``Input.``/``Answer.`` prefixes
  (`eval.py:185-205` ``process_batch``).
- :func:`aggregate_judgments` — per-example un-blinding + majority
  vote + agreement + mean missing/extra counts
  (`eval.py:214-283` ``process_batch_row``/``summarize``/
  ``process_turk``), as one groupBy — no driver-side row loop.
- :func:`analyze_judgments` — per-dataset means + overall row
  (`eval.py:286-300` ``analyze_turk``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# `eval.py:186-196`: platform columns dropped before analysis.
MTURK_META_COLS = [
    "HITId", "HITTypeId", "Title", "Description", "Keywords", "Reward",
    "CreationTime", "MaxAssignments", "RequesterAnnotation",
    "AssignmentDurationInSeconds", "AutoApprovalDelayInSeconds",
    "Expiration", "NumberOfSimilarHITs", "LifetimeInSeconds",
    "AssignmentId", "WorkerId", "AssignmentStatus", "AcceptTime",
    "SubmitTime", "AutoApprovalTime", "ApprovalTime", "RejectionTime",
    "RequesterFeedback", "WorkTimeInSeconds", "LifetimeApprovalRate",
    "Last30DaysApprovalRate", "Last7DaysApprovalRate",
]


def survey_format(
    results: DataFrame,
    defn: str,
    examples_per_dataset: int = 20,
    seed: int = 0,
) -> DataFrame:
    """results(dataset, para, preds array, entities array, f1) →
    blinded survey rows (id, defn, sentence, list1, list2, gptlist,
    f1, dataset, is_attention).

    Parity with ``get_survey_format`` (`eval.py:110-148`): perfect-F1
    rows are attention-check material; imperfect rows are sampled per
    dataset; a seeded hash decides which side the model list lands on
    (``gptlist`` ∈ {1, 2}); empty gold rows are dropped."""
    pred_s = F.array_join(F.array_distinct("preds"), ", ")
    true_s = F.array_join(F.array_distinct("entities"), ", ")
    flip = F.pmod(F.xxhash64("para", F.lit(seed)), F.lit(2)) == 0
    base = (
        results
        .where(F.size("entities") > 0)
        .select(
            F.lit(defn).alias("defn"),
            F.col("para").alias("sentence"),
            F.when(flip, pred_s).otherwise(true_s).alias("list1"),
            F.when(flip, true_s).otherwise(pred_s).alias("list2"),
            F.when(flip, F.lit(1)).otherwise(F.lit(2)).alias("gptlist"),
            "f1", "dataset",
            (F.col("f1") == 1.0).alias("is_attention"),
        )
    )
    w = Window.partitionBy("dataset").orderBy(
        F.xxhash64("sentence", F.lit(seed + 1)))
    sampled = (
        base.where(~F.col("is_attention"))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= examples_per_dataset).drop("_rk")
    )
    out = sampled.unionByName(base.where(F.col("is_attention")))
    # id: stable shuffled ordinal for real examples, -1 for attention
    # checks (`eval.py:147,155`); gaps from interleaved attention rows
    # are harmless — ids only need to be unique and joinable.
    wid = Window.orderBy(F.xxhash64("sentence", F.lit(seed + 2)))
    return out.withColumn(
        "id",
        F.when(F.col("is_attention"), F.lit(-1))
        .otherwise(F.row_number().over(wid) - 1))


def assign_workers(
    survey: DataFrame,
    n_workers: int = 10,
    workers_per_example: int = 3,
    n_attentions: int = 2,
    seed: int = 0,
) -> DataFrame:
    """survey rows → + ``worker`` column: every non-attention example
    goes to ``workers_per_example`` DISTINCT workers, load balanced
    ±1 by round-robin on the example rank; every worker additionally
    receives ``n_attentions`` attention-check rows (`eval.py:158-172`).
    """
    if workers_per_example > n_workers:
        raise ValueError("workers_per_example cannot exceed n_workers")
    ex = survey.where(~F.col("is_attention"))
    replicas = ex.withColumn(
        "_r", F.explode(F.sequence(F.lit(0),
                                   F.lit(workers_per_example - 1))))
    assigned = replicas.withColumn(
        "worker",
        F.pmod(F.col("id") * workers_per_example + F.col("_r"),
               F.lit(n_workers)).cast("int")).drop("_r")

    att = survey.where(F.col("is_attention"))
    watt = Window.partitionBy("worker").orderBy(
        F.xxhash64("sentence", "worker", F.lit(seed + 3)))
    att_assigned = (
        att.withColumn(
            "worker",
            F.explode(F.sequence(F.lit(0), F.lit(n_workers - 1))))
        .withColumn("worker", F.col("worker").cast("int"))
        .withColumn("_rk", F.row_number().over(watt))
        .where(F.col("_rk") <= n_attentions).drop("_rk")
    )
    return assigned.unionByName(att_assigned)


def decode_turk_batch(batch: DataFrame) -> DataFrame:
    """Strip MTurk platform metadata and normalize ``Input.x`` /
    ``Answer.x`` column names to ``x`` (`eval.py:185-205`)."""
    out = batch.drop(*[c for c in MTURK_META_COLS if c in batch.columns])
    for c in out.columns:
        if c.startswith("Input.") or c.startswith("Answer."):
            out = out.withColumnRenamed(c, c.split(".", 1)[1])
    return out


def _mode_and_agreement(col: str):
    """The reference's ``summarize`` quirk (`eval.py:243-252`): report
    the modal value; agreement is 1 when mode == mean, 0 when exactly
    two judgments (and they disagree, else mode==mean), 0.5 otherwise.
    Expressed over a collected judgment array (bounded by
    workers_per_example, O(3) elements)."""
    arr = F.col(f"_{col}_arr")
    n = F.size(arr)
    ones = F.aggregate(arr, F.lit(0), lambda a, x: a + x)
    mean = ones / n
    # judgments are 0/1 ints: mode = 1 iff ones*2 > n, ties -> the
    # pandas value_counts order quirk resolves by first-seen; with
    # 0/1 data and an exact tie the reference's index[0] is
    # input-order-dependent — we pin ties to 0 (documented delta)
    mode = F.when(ones * 2 > n, F.lit(1)).otherwise(F.lit(0))
    agreement = (
        F.when(mean == mode.cast("double"), F.lit(1.0))
        .when(n == 2, F.lit(0.0))
        .otherwise(F.lit(0.5))
    )
    return mode.alias(col), agreement.alias(f"{col}_agreement")


def aggregate_judgments(survey: DataFrame, responses: DataFrame) -> DataFrame:
    """survey (blinded, keyed by id) ⋈ worker responses → per-example
    un-blinded majority verdicts.

    responses columns (per `eval.py:214-240` ``process_batch_row``):
    (id, worker, l1correct, l2correct, better, l1missing, l2missing,
    l1extra, l2extra) — ``better`` ∈ {1, 2}, missing/extra are
    comma-joined phrase strings or null."""
    gptno = F.col("gptlist")
    trueno = F.when(gptno == 2, 1).otherwise(2)

    def pick(prefix: str, no) -> F.Column:
        return F.when(no == 1, F.col(f"l1{prefix}")) \
            .otherwise(F.col(f"l2{prefix}"))

    def n_phrases(c: F.Column) -> F.Column:
        return F.when(c.isNull() | (c == ""), F.lit(0)) \
            .otherwise(F.size(F.split(c, ",")))

    joined = responses.join(
        F.broadcast(survey.select("id", "gptlist", "f1", "dataset")
                    .where(F.col("id") >= 0)), "id")
    row = joined.select(
        "id", "dataset",
        pick("correct", gptno).cast("int").alias("gptcorrect"),
        pick("correct", trueno).cast("int").alias("truecorrect"),
        (F.col("better") == gptno).cast("int").alias("gptbetter"),
        (F.col("better") == trueno).cast("int").alias("gptworse"),
        n_phrases(pick("missing", gptno)).alias("gptmissing"),
        n_phrases(pick("extra", gptno)).alias("gptextra"),
        n_phrases(pick("missing", trueno)).alias("truemissing"),
        n_phrases(pick("extra", trueno)).alias("trueextra"),
    )
    votes = ["gptcorrect", "truecorrect", "gptbetter", "gptworse"]
    agg = row.groupBy("id", "dataset").agg(
        F.count(F.lit(1)).alias("num"),
        *[F.collect_list(v).alias(f"_{v}_arr") for v in votes],
        *[F.avg(m).alias(m) for m in
          ("gptmissing", "gptextra", "truemissing", "trueextra")],
    )
    mode_cols = [c for v in votes for c in _mode_and_agreement(v)]
    return agg.select("id", "dataset", "num", *mode_cols,
                      "gptmissing", "gptextra", "truemissing", "trueextra")


def analyze_judgments(per_example: DataFrame) -> DataFrame:
    """Per-dataset + overall summary (`eval.py:286-300`)."""
    metrics = ["gptcorrect", "gptcorrect_agreement",
               "truecorrect", "truecorrect_agreement",
               "gptbetter", "gptbetter_agreement",
               "gptworse", "gptworse_agreement",
               "gptmissing", "gptextra", "truemissing", "trueextra"]
    by_ds = per_example.groupBy("dataset").agg(
        *[F.avg(m).alias(m) for m in metrics])
    overall = per_example.groupBy(F.lit("All").alias("dataset")).agg(
        *[F.avg(m).alias(m) for m in metrics])
    return overall.unionByName(by_ds)
