"""Span alignment: project extracted surface forms back onto the token
sequence as IOB2 tags (operators SP1/SP2 in SURVEY.md §2.6).

This is the byte-identical invariant of the whole pipeline — the
golden-replay tests require that, given the reference's own raw LLM
outputs, these functions reproduce the reference's recorded tag
sequences exactly. Reference citations: alignment `algorithms.py:72-131`,
n-th-occurrence helpers `utils.py:8-36`.

Preserved reference quirks (do NOT "fix" — parity contract):

* ``nth_subsequence_start`` returns -1 when there are MORE than n
  matches, not fewer (`utils.py:33-34`); with fewer it raises
  IndexError like the reference's ``found[n-1]``.
* a multi-word answer whose subsequence lookup returns -1 still tags:
  index -1 writes ``B-`` on the LAST token and the ``I-`` loop then
  runs from token 0 (`algorithms.py:119-129` has no -1 guard).
* only single-word answers respect an existing non-"O" tag
  (`algorithms.py:106`); multi-word spans overwrite freely.
* occurrence counting uses substring counts over the raw paragraph
  (``para.count(answer)``) but index lookup over the token list —
  the deliberate mismatch of `algorithms.py:100-105` is kept.
* an answer with no ``(type)`` in its typestring is skipped entirely
  (`algorithms.py:86-89`).
* answers are re-split around ``'s`` and ``:`` so "china's" matches
  tokens ["china", "'s"] (`algorithms.py:80,90-92,113-115`).
* FewNERD-style types containing ``-`` are written verbatim with no
  B-/I- prefix (`algorithms.py:107-110,121-128`).
"""

from __future__ import annotations

SPLIT_TOKENS = ("'s", ":")


def nth_index_in_str(haystack: str, needle: str, n: int) -> int:
    """Character index of the n-th occurrence of ``needle`` in
    ``haystack`` (1-based n); -1 if absent (`utils.py:8-13`)."""
    pos = haystack.find(needle)
    while pos >= 0 and n > 1:
        pos = haystack.find(needle, pos + len(needle))
        n -= 1
    return pos


def nth_index_in_tokens(tokens: list[str], needle: str, n: int) -> int:
    """Index of the n-th occurrence of ``needle`` in ``tokens``
    (1-based n); raises ValueError when there is no n-th occurrence
    (`utils.py:15-20` — the reference propagates ``list.index``'s
    ValueError and we keep that contract)."""
    pos = tokens.index(needle)
    while pos >= 0 and n > 1:
        pos = tokens.index(needle, pos + 1)
        n -= 1
    return pos


def nth_subsequence_start(tokens: list[str], needle: str, n: int) -> int:
    """Start index of the n-th place where ``needle`` (a space-joined
    phrase) appears as a contiguous token run (`utils.py:22-36`).

    Quirk parity: returns -1 when the phrase occurs MORE than n times;
    raises IndexError when it occurs fewer than n times.
    """
    if n < 0:
        return -1
    if n == 0:
        n = 1
    width = len(needle.split(" "))
    starts = [
        i for i in range(len(tokens))
        if needle == " ".join(tokens[i:i + width])
    ]
    if len(starts) > n:
        return -1
    return starts[n - 1]


def _resplit(text: str) -> str:
    """Re-tokenize around the attached tokens ``'s`` and ``:`` so that
    e.g. ``china's`` becomes ``china 's`` (`algorithms.py:90-92`)."""
    for tok in SPLIT_TOKENS:
        text = (" " + tok).join(text.split(tok))
    return text


def align_spans(
    para: str,
    answers: list[str],
    typestrings: list[str],
    true_tokens: list[str] | None = None,
) -> list[str]:
    """Produce one IOB2 tag per token of ``para`` from extracted
    ``answers`` + parallel ``typestrings`` (`algorithms.py:72-131`).

    ``true_tokens`` overrides whitespace tokenization when the original
    tokenization is lossy (TweetNER; `algorithms.py:74-75`).
    """
    para = para.lower()
    if true_tokens is not None:
        words = [t.lower() for t in true_tokens]
    else:
        words = para.split(" ")
    tags = ["O"] * len(words)
    claimed: list[str] = []  # answers already placed, drives n-th occurrence

    for i, raw_answer in enumerate(answers):
        answer = raw_answer.strip().lower()
        if "(" in answer:  # stray inline type annotation
            answer = answer[: answer.find("(")].strip()
        types = typestrings[i]
        if "(" in types and ")" in types:
            types = types[types.find("(") + 1: types.find(")")]
        else:
            continue  # untyped answer → dropped (algorithms.py:89)
        dashed = "-" in types  # FewNERD fine-grained type, no B/I prefix

        exists = answer in para or _resplit(answer) in para
        if not exists:
            continue

        if len(answer.split(" ")) == 1:
            if answer not in words:
                continue
            if para.count(answer) > 1:
                nth = claimed.count(answer.strip()) + 1
                idx = nth_index_in_tokens(words, answer, nth)
            else:
                idx = words.index(answer)
            if tags[idx] == "O":  # single words never overwrite (algorithms.py:106)
                tags[idx] = types if dashed else "B-" + types
            claimed.append(answer)
        else:
            for tok in SPLIT_TOKENS:
                if tok in answer:
                    answer = (" " + tok).join(answer.split(tok))
            span_words = answer.split(" ")
            nth = claimed.count(answer.strip()) + 1
            idx = nth_subsequence_start(words, answer, nth)
            end = idx + len(span_words)
            tags[idx] = types if dashed else "B-" + types
            for j in range(idx + 1, end):
                tags[j] = types if dashed else "I-" + types
            claimed.append(answer)

    return tags
