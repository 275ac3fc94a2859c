"""C1 set_config 16-cell matrix + ablation harness (reference
`algorithms.py:453-541` ``Config.set_config`` and `run.py:266-313`
``ablate_all``/``ablate_best``)."""

from __future__ import annotations

import itertools

from promptner_spark.functions.prompts import (
    COT_FORMAT, EXEMPLAR_FORMAT, NO_TF_FORMAT, TASK_COT_NOTF, TASK_COT_TF,
    TASK_PLAIN, TF_FORMAT, ExemplarFamilies, set_config,
)

FAMILIES = ExemplarFamilies(
    cot=("Paragraph: a b \nAnswer:\n1. a | True | why (T)",),
    no_tf=("Paragraph: a b \nAnswer:\n1. a | why (T)",),
    tf=("Paragraph: a b \nAnswer:\n1. a | True | (T)",),
    plain=("Paragraph: a b \nAnswer:\n1. a | (T)",),
)


def test_sixteen_cells_produce_expected_prompts():
    """Every (defn, exemplar, coT, tf) cell resolves to the right task
    sentence, format block, exemplar family, and definition presence —
    the reference matrix, cell by cell."""
    fmt_by_cell = {(True, True): COT_FORMAT, (True, False): NO_TF_FORMAT,
                   (False, True): TF_FORMAT, (False, False): EXEMPLAR_FORMAT}
    task_by_cell = {(True, True): TASK_COT_TF, (True, False): TASK_COT_NOTF,
                    (False, True): TASK_PLAIN, (False, False): TASK_PLAIN}
    family_marker = {(True, True): "| True | why", (True, False): "| why",
                     (False, True): "| True | (T)", (False, False): "| (T)"}

    seen = set()
    for d, e, c, t in itertools.product([True, False], repeat=4):
        spec = set_config("DEFN_SENTINEL", families=FAMILIES,
                          exemplar=e, coT=c, tf=t, defn=d)
        p = spec.prefix()
        seen.add(p)
        assert p.endswith("\nParagraph: ")
        assert ("DEFN_SENTINEL" in p) == d
        assert task_by_cell[(c, t)] in p
        assert fmt_by_cell[(c, t)] in p
        # correct exemplar family present iff exemplar=True
        assert (family_marker[(c, t)] in p) == e
        # with exemplars, the task sentence is interleaved: once in the
        # format instruction + once per exemplar (reference
        # exemplar_construction repeats whole_task per exemplar)
        expected_occurrences = 2 if e else 1
        if (c, t) == (False, False) or (c, t) == (False, True):
            pass  # TASK_PLAIN shared by two cells; count still holds
        assert p.count(task_by_cell[(c, t)]) == expected_occurrences
    # all 16 prompts are distinct
    assert len(seen) == 16


def test_default_promptspec_is_unchanged():
    """The oracle/golden-replay cell (direct PromptSpec()) must not be
    affected by the matrix machinery."""
    from promptner_spark.functions.prompts import (
        DEFAULT_DEFN, DEFAULT_FORMAT_TASK, PromptSpec)

    p = PromptSpec().prefix()
    assert p == DEFAULT_DEFN + "\n" + DEFAULT_FORMAT_TASK + "\nParagraph: "


def test_ablation_table_shape(spark):
    """ablate() over a tiny gold table: full grid = 16 rows, best-cells
    grid = 5 rows, columns and value ranges as documented; the
    deterministic backend makes repeats variance-free."""
    from promptner_spark.plans.evaluate_gold import (
        ABLATE_BEST_CELLS, ablate, ablation_cells)

    gold = spark.createDataFrame(
        [("d1", 0, "the stream joins a vector",
          ["O", "B-SRC", "O", "O", "B-DATA"]),
         ("d2", 0, "a filter runs", ["O", "B-OP", "O"]),
         ("d3", 0, "nothing here", ["O", "O"])],
        "doc_id string, sent_id int, text string, "
        "exact_types array<string>")

    full = ablate(gold, cells=ablation_cells()[:4] + [(False,) * 4])
    assert list(full.columns) == [
        "defn", "exemplar", "cot", "tf", "micro_f1_mean", "micro_f1_std",
        "macro_f1_mean", "macro_f1_std", "n_runs"]
    assert len(full) == 5
    assert ((0.0 <= full["micro_f1_mean"]) & (full["micro_f1_mean"] <= 1.0)).all()
    assert (full["micro_f1_std"] == 0.0).all()   # deterministic backend

    assert len(ablation_cells()) == 16
    assert len(ABLATE_BEST_CELLS) == 5
    best = ablate(gold, cells=ABLATE_BEST_CELLS)
    assert len(best) == 5
    assert (best["n_runs"] == 1).all()


def test_chat_system_turn_uses_whole_task_with_exemplars():
    """Reference `algorithms.py:202-219`: with exemplars the chat
    system turn carries the bare task sentence (whole_task), without
    them the full format_task; exemplars become user/assistant pairs."""
    from promptner_spark.functions.prompts import (
        TASK_COT_TF, chat_message_prefix, set_config)

    with_ex = set_config("D.", families=FAMILIES, exemplar=True)
    msgs = chat_message_prefix(with_ex)
    assert msgs[0][1] == "system"
    assert TASK_COT_TF in msgs[0][0]
    assert "Answer in the format" not in msgs[0][0]   # whole_task only
    assert [r for _c, r in msgs[1:]] == ["user", "assistant"]

    without = set_config("D.", families=FAMILIES, exemplar=False)
    msgs2 = chat_message_prefix(without)
    assert "Answer in the format" in msgs2[0][0]      # format_task
    assert len(msgs2) == 1
