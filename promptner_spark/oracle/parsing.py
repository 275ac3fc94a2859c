"""LLM-answer parsing (operators A1-A3 in SURVEY.md §2.5).

The model is prompted to answer with a numbered list of
``entity | True/False | explanation (type)`` lines; these functions
turn that raw text into parallel ``(surfaces, typestrings)`` lists.

Behavioral parity targets (reference citations):
- numbered-list splitting: `utils.py:61-87`
- fuzzy boolean mapping:   `utils.py:89-105`
- exemplar-format parsing: `utils.py:107-153`

All reference quirks are kept because the golden-replay tests
(tests/test_golden_replay.py) require byte-identical downstream tags:

* a line like ``1) foo`` keeps its ``)`` — the prefix stripper only
  consumes digits and ``.`` (`utils.py:72-75`);
* in the no-newline fallback, a segment is dropped when it merely
  *contains* the word "answer" (`utils.py:117`), while the newline
  path drops only exact ``answer:`` lines (`utils.py:69`);
* a 2-field line whose second field is not literally true/false is
  treated as (entity, explanation) with implicit status=true
  (`utils.py:131-136`);
* a >3-field line keeps fields 0/1 and DISCARDS the explanation, so
  no typestring is emitted for it (`utils.py:139-141`) — surfaces and
  typestrings can therefore differ in length, which downstream
  alignment surfaces as an index error exactly like the reference.
"""

from __future__ import annotations

import re

_NUM_PREFIX = re.compile(r"\d+[.)]+ *")
_NUM_SPLIT = re.compile(r"\d+[.)]")


def numbered_list_items(output: str) -> list[str]:
    """Extract the items of a numbered list from raw model output.

    Two regimes, matching `utils.py:63-87`: if the text contains
    newlines, each line must look like ``<n>. item``; otherwise the
    whole text is split on ``<n>.``/``<n>)`` markers.
    """
    items: list[str] = []
    if "\n" in output:
        for raw in output.split("\n"):
            line = raw.strip()
            if line.lower().strip() in ("", "answer:"):
                continue
            if _NUM_PREFIX.match(line):
                cut = 0
                # consume the numeric prefix: digits and '.' only —
                # deliberately NOT ')' (parity with utils.py:73-74)
                while cut < len(line) and (line[cut].isnumeric() or line[cut] == "."):
                    cut += 1
                items.append(line[cut:].strip())
            # non-matching non-empty lines are dropped silently
    else:
        for seg in _NUM_SPLIT.split(output):
            seg = seg.strip()
            if seg.lower().strip() in ("", "answer:"):
                continue
            items.append(seg)
    return items


def truthy_of_output(output: str, default: bool = True) -> bool:
    """Fuzzy-map free-text yes/no/true/false to a boolean
    (`utils.py:89-105`); ambiguous or unmappable → ``default``."""
    low = output.lower()
    says_true = ("yes " in low) or ("yes." in low) or ("true" in low)
    says_false = ("no " in low) or ("no." in low) or ("false" in low)
    if says_true and not says_false:
        return True
    if says_false and not says_true:
        return False
    return default


def parse_exemplar_answers(
    output: str,
    separator: str = "|",
    true_only: bool = True,
    identify_types: bool = True,
):
    """Parse raw model output in the CoT exemplar format into parallel
    ``(surfaces, typestrings)`` lists (`utils.py:107-153`).

    Each listed item is split on ``separator``:
      2 fields → (entity, True/False) or (entity, explanation);
      3 fields → (entity, status, explanation);
      >3       → (entity, status), explanation discarded;
      1 field (separator absent from item) → bare entity, no typestring.
    Only status=true rows survive when ``true_only``. Entities are
    lowercased + stripped; explanations stripped.
    """
    if "\n" in output:
        listed = numbered_list_items(output)
    else:
        listed = []
        if "1" in output:
            for seg in _NUM_SPLIT.split(output):
                seg_l = seg.strip().lower()
                if seg_l == "" or "answer" in seg_l:
                    continue
                listed.append(seg.strip())

    surfaces: list[str] = []
    typestrings: list[str] = []
    for item in listed:
        if separator not in item:
            surfaces.append(item.strip().lower())
            continue
        fields = item.split(separator)
        explanation = None
        if len(fields) == 1:  # unreachable (separator is in item) — kept for shape parity
            continue
        elif len(fields) == 2:
            entity, second = fields
            if second.strip().lower() in ("true", "false"):
                status = second
            else:
                status = "true"
                explanation = second
        elif len(fields) == 3:
            entity, status, explanation = fields
        else:
            entity, status = fields[0], fields[1]
        if status.strip().lower() == "true" or not true_only:
            if explanation is not None:
                typestrings.append(explanation.strip())
            surfaces.append(entity.strip().lower())

    if not identify_types:
        return surfaces
    return surfaces, typestrings
