"""IOB2 tag sequence → mention spans.

The reference never materializes spans from tags (its dict keyed on
surface forms collides on duplicates, `data.py:38` — SURVEY.md §1.1);
the engine's mention table keys on (begin, end) instead. Semantics
follow the reference's tag conventions: ``B-x`` starts, ``I-x``
continues a same-type run, dashed FewNERD types appear verbatim with
no B/I prefix and contiguous equal tags merge (`data.py:77-85`,
`algorithms.py:107-110`). An orphan ``I-x`` (possible via the
reference's -1-index alignment quirk, `algorithms.py:119-129`) starts
a new span.
"""

from __future__ import annotations


def tags_to_mentions(tokens: list[str], tags: list[str]) -> list[dict]:
    """One dict per span: {begin, end (exclusive), surface, type}."""
    out: list[dict] = []
    cur_begin: int | None = None
    cur_type: str | None = None

    def close(end: int):
        nonlocal cur_begin, cur_type
        if cur_type is not None and cur_begin is not None:
            out.append({
                "begin": cur_begin,
                "end": end,
                "surface": " ".join(tokens[cur_begin:end]),
                "type": cur_type,
            })
        cur_begin, cur_type = None, None

    for i, tag in enumerate(tags):
        if tag == "O" or tag == "":
            close(i)
        elif tag.startswith("B-"):
            close(i)
            cur_begin, cur_type = i, tag[2:]
        elif tag.startswith("I-"):
            t = tag[2:]
            if cur_type == t and cur_begin is not None:
                continue
            close(i)
            cur_begin, cur_type = i, t
        else:
            # FewNERD verbatim dashed type: merge contiguous equals
            if cur_type == tag and cur_begin is not None:
                continue
            close(i)
            cur_begin, cur_type = i, tag
    close(len(tags))
    return out
