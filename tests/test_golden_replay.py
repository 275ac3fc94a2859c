"""Golden replay: feed the reference repo's checked-in raw LLM outputs
(`results/*.csv`, column ``meta``) through our answer parser + span
aligner and require byte-identical IOB2 tags versus the reference's
recorded ``pred`` column (written by reference `run.py:31-37,235-236`).

This validates the parity-critical oracle core (A1/A2 + SP1/SP2) with
zero model calls — the strongest correctness evidence available in-tree.
"""

import ast
import csv
import glob
import os

import pytest

from promptner_spark.oracle import align_spans, parse_exemplar_answers

from .conftest import REFERENCE_DIR

RESULTS_GLOB = os.path.join(REFERENCE_DIR, "results", "*.csv")


def _rows(path):
    with open(path, newline="") as fh:
        for row in csv.DictReader(fh):
            yield row


def _replay_one(row):
    surfaces, typestrings = parse_exemplar_answers(row["meta"])
    try:
        return align_spans(row["text"], surfaces, typestrings)
    except (IndexError, ValueError):
        # reference run.py:43-44 drops rows that raise IndexError; any
        # row present in the CSV parsed successfully there, so a raise
        # here is a genuine mismatch — surface it as such.
        raise


@pytest.mark.parametrize(
    "path", sorted(glob.glob(RESULTS_GLOB)), ids=lambda p: os.path.basename(p)
)
def test_replay_matches_reference_pred(path):
    if not os.path.exists(path):
        pytest.skip("reference results not available")
    total = 0
    mismatches = []
    for row in _rows(path):
        expected = ast.literal_eval(row["pred"])
        got = _replay_one(row)
        total += 1
        if got != expected:
            mismatches.append((row["text"][:60], expected, got))
    assert total > 0
    assert not mismatches, (
        f"{len(mismatches)}/{total} rows mismatched; first: {mismatches[0]}"
    )
