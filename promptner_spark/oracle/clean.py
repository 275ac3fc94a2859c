"""Answer cleaning / normalization scalars (operators P1, P6, P7).

Reference citations: answer cleaning `algorithms.py:37-63`, normalized
equality `eval.py:20-21`, BIO prefix strip `data.py:345-349`.
"""

from __future__ import annotations

import string

from .stopwords import ENGLISH_STOPWORDS

TRIVIAL_ANSWERS = ["", " ", ".", "-"]
_PUNCT = "".join(string.punctuation)


def clean_answers(answers: list[str], typestrings: list[str] | None = None):
    """Dedup + de-trivialize extracted answers (`algorithms.py:37-63`).

    Untyped mode: set-dedup, then remove trivial tokens and English
    stopwords, then strip a trailing ``(...)`` annotation and
    surrounding punctuation from each survivor.

    Typed mode parity note: the reference builds filtered
    ``new_answers/new_typestrings`` lists and then *discards them*,
    returning the original (punctuation-stripped) lists with
    duplicates and stopwords still present (`algorithms.py:44-53`
    versus the return at `algorithms.py:60-63`). We reproduce that
    outcome — typed mode only strips annotations/punctuation.
    """
    drop = TRIVIAL_ANSWERS + ENGLISH_STOPWORDS
    if typestrings is None:
        answers = list(set(answers))
        for trivial in drop:
            while trivial in answers:
                answers.remove(trivial)
    # annotation + punctuation strip applies to whatever list remains
    for i, ans in enumerate(answers):
        if "(" in ans:
            ans = ans[: ans.find("(")]
        answers[i] = ans.strip().strip(_PUNCT).strip()
    if typestrings is None:
        return answers
    return answers, typestrings


def normalize_surface(text: str) -> str:
    """Lowercase + trim + strip surrounding punctuation — the shared
    normalization of `eval.py:20-21` / `algorithms.py:58`, also used as
    the entity-linking key (J1)."""
    return text.lower().strip().strip(_PUNCT).strip()


def normalized_eq(a: str, b: str) -> bool:
    """Normalized string equality (`eval.py:20-21`)."""
    return normalize_surface(a) == normalize_surface(b)


def strip_bio_prefix(tag: str) -> str:
    """``B-PER``/``I-PER`` → ``PER``; other tags pass through
    (`data.py:345-349`)."""
    if tag.startswith("B-") or tag.startswith("I-"):
        return tag[2:]
    return tag
