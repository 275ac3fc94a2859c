"""User-facing API parity with the reference's ``custom.get_ner_system``
(`custom.py:82-94`): a closure that annotates ONE sentence at a time.

Driver-side convenience only — it reuses the exact per-row chain the
cluster path runs inside its fused UDF (prompt render → backend →
parse → clean → align), so library users migrating from the reference
get identical outputs, and scaling up means switching to
``plans.pipeline.build_pipeline`` / ``operators.infer.extract_mentions``
over a DataFrame instead of looping this closure.
"""

from __future__ import annotations

from typing import Callable

from .functions.prompts import PromptSpec
from .operators.model import Backend, default_backend_factory
from .oracle.align import align_spans
from .oracle.clean import clean_answers
from .oracle.parsing import parse_exemplar_answers


def get_ner_system(
    split_phrases: bool = False,
    identify_types: bool = True,
    spec: PromptSpec | None = None,
    backend_factory: Callable[[], Backend] | None = None,
) -> Callable[[str], tuple]:
    """Returns ``get_entities(sentence) -> (entities, types, raw)`` —
    reference signature (`custom.py:85-94`; type list omitted when
    ``identify_types`` is False, matching `algorithms.py:181-184`).

    ``split_phrases`` explodes multi-word answers into single words
    (P3, `algorithms.py:158-175` — off in every reference eval)."""
    spec = spec or PromptSpec()
    backend = (backend_factory or default_backend_factory)()
    prefix, suffix = spec.prefix(), PromptSpec.SUFFIX

    def get_entities(sentence: str):
        raw = backend.generate([prefix + sentence + suffix])[0]
        if identify_types:
            surfaces, typestrings = parse_exemplar_answers(
                raw, true_only=True, identify_types=True)
        else:
            # identify_types=False returns a bare surfaces list
            # (`utils.py:151-153`); pad typestrings so the shared
            # clean/split path below stays uniform.
            surfaces = parse_exemplar_answers(
                raw, true_only=True, identify_types=False)
            typestrings = [""] * len(surfaces)
        if split_phrases:
            exploded, exploded_t = [], []
            for s, t in zip(surfaces, typestrings or [""] * len(surfaces)):
                for w in s.split(" "):
                    exploded.append(w)
                    exploded_t.append(t)
            surfaces, typestrings = exploded, exploded_t
        surfaces, typestrings = clean_answers(
            list(surfaces), list(typestrings))
        if identify_types:
            return surfaces, typestrings, raw
        return surfaces, raw

    return get_entities


def get_tagging_system(
    spec: PromptSpec | None = None,
    backend_factory: Callable[[], Backend] | None = None,
) -> Callable[[str], list[str]]:
    """One-sentence IOB2 tagger: the ``perform_span`` equivalent
    (`algorithms.py:67-70` + `parse_span` `algorithms.py:72-131`)."""
    spec = spec or PromptSpec()
    backend = (backend_factory or default_backend_factory)()
    prefix, suffix = spec.prefix(), PromptSpec.SUFFIX

    def tag(sentence: str) -> list[str]:
        raw = backend.generate([prefix + sentence + suffix])[0]
        surfaces, typestrings = parse_exemplar_answers(
            raw, true_only=True, identify_types=True)
        surfaces, typestrings = clean_answers(
            list(surfaces), list(typestrings))
        return align_spans(sentence, surfaces, typestrings)

    return tag
