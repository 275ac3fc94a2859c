"""Cross-document line dedup (operators/lines.py): hand-case
semantics (boilerplate stripped, unique content kept, order
preserved), the blank-line and within-doc-repeat rules, round-trip
identity for clean docs, and the scale contract (the frequency
dictionary broadcasts — the membership join is exchange-free on the
corpus side)."""

from __future__ import annotations

from promptner_spark.operators.lines import line_counts, strip_common_lines


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


BOILER = "accept all cookies"


def test_hand_case(spark):
    docs = _docs(spark, [
        (1, f"{BOILER}\nunique alpha\ncommon footer"),
        (2, f"{BOILER}\nunique beta\ncommon footer"),
        (3, "unique gamma"),
    ])
    out = {r["doc_id"]: r for r in
           strip_common_lines(docs, min_docs=2).collect()}
    assert out[1]["text"] == "unique alpha"
    assert out[2]["text"] == "unique beta"
    assert out[3]["text"] == "unique gamma"
    assert out[1]["n_dropped"] == 2 and out[1]["n_kept"] == 1
    # a doc that loses nothing round-trips byte-identically
    assert out[3]["n_dropped"] == 0


def test_within_doc_repeats_count_once(spark):
    """A doc repeating its own footer 100x contributes ONE census
    vote — min_docs counts distinct documents, not occurrences."""
    docs = _docs(spark, [
        (1, "spam\nspam\nspam\ncontent"),
        (2, "other content"),
    ])
    counts = {r["line_h"]: r["n_docs"]
              for r in line_counts(docs).collect()}
    assert set(counts.values()) == {1}   # every key seen in one doc
    out = {r["doc_id"]: r["text"]
           for r in strip_common_lines(docs, min_docs=2).collect()}
    assert out[1] == "spam\nspam\nspam\ncontent"


def test_blank_lines_always_kept_and_never_counted(spark):
    docs = _docs(spark, [
        (1, "a\n\nb"), (2, "c\n\nd"), (3, "e\n  \nf"),
    ])
    out = {r["doc_id"]: r["text"]
           for r in strip_common_lines(docs, min_docs=2).collect()}
    # the blank line appears in all three docs but is structure,
    # not boilerplate
    assert out[1] == "a\n\nb" and out[3] == "e\n  \nf"


def test_matching_is_case_and_whitespace_insensitive(spark):
    """The match key is lower(trim(line)) but the KEPT text is raw."""
    docs = _docs(spark, [
        (1, "  Accept ALL Cookies \nkeep one"),
        (2, "accept all cookies\nkeep two"),
        (3, "accept all cookies\nkeep three"),
    ])
    out = {r["doc_id"]: r["text"]
           for r in strip_common_lines(docs, min_docs=3).collect()}
    assert out == {1: "keep one", 2: "keep two", 3: "keep three"}


def test_doc_losing_every_line_survives_with_empty_text(spark):
    docs = _docs(spark, [(1, BOILER), (2, BOILER), (3, "real text")])
    out = {r["doc_id"]: r for r in
           strip_common_lines(docs, min_docs=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["text"] == "" and out[1]["n_kept"] == 0


def test_freq_dictionary_broadcasts(spark):
    docs = _docs(spark, [(1, "x\ny"), (2, "x\nz")])
    plan = (strip_common_lines(docs, min_docs=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    shuffled = (strip_common_lines(docs, min_docs=2,
                                   broadcast_freq=False)
                ._jdf.queryExecution().executedPlan().toString())
    assert "SortMergeJoin" in shuffled or "ShuffledHashJoin" in shuffled
