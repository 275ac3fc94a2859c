"""Inference backends (operators M1-M4, SURVEY.md §2.4).

The reference calls OpenAI / HuggingFace one sentence at a time with a
3.01 s throttle (`models.py:10-52`, `run.py:16-44`). Here the model is
behind a batch :class:`Backend` interface consumed by an Arrow-batched
``mapInPandas`` stage — hundreds of prompts per call, one backend
instance per executor task (iterator UDF), retry-with-backoff replacing
the reference's sleep-spin (`run.py:26-44`), and failures recorded as
rows instead of silently swallowed (the reference drops them via a bare
IndexError pass, `run.py:43-44` — a bug we do not copy).

The default backend is the deterministic gazetteer extractor (M4): the
sandbox has no API access and the north rule requires byte-identical
reproducibility. It answers in the reference's CoT numbered-list format
so parse/align downstream run the true reference semantics.
"""

from __future__ import annotations

import time
from typing import Callable, Protocol

from .gazetteer import GAZETTEER

PARA_MARK = "Paragraph: "
ANSWER_MARK = " \nAnswer:"
PHRASE_MARK = "Entity Phrase: "


class Backend(Protocol):
    def generate(self, prompts: list[str]) -> list[str]: ...


def _last_between(prompt: str, start: str, end: str) -> str:
    """The payload of the final prompt section — rfind because few-shot
    exemplars embed earlier ``Paragraph:`` sections (`algorithms.py:192`)."""
    i = prompt.rfind(start)
    if i < 0:
        return ""
    j = prompt.find(end, i)
    body = prompt[i + len(start): j if j >= 0 else len(prompt)]
    return body


class GazetteerBackend:
    """Deterministic mention proposer (M4).

    For an extraction prompt: finds every gazetteer surface present in
    the paragraph (single words as token matches, phrases as contiguous
    token runs), orders them by (first token index, gazetteer order),
    and renders the reference answer format
    ``n. surface | True | explanation (TYPE)``.

    For a type-verification / dispute prompt (C7/C8): answers with the
    gazetteer type of the quoted phrase.
    """

    def __init__(self, gazetteer: dict[str, str] | None = None):
        self.gazetteer = gazetteer if gazetteer is not None else dict(GAZETTEER)
        # precompute split forms once per instance (per executor task)
        self._entries = [
            (surface, surface.split(" "), gtype, order)
            for order, (surface, gtype) in enumerate(self.gazetteer.items())
        ]

    def _first_subseq(self, tokens: list[str], phrase: list[str]) -> int:
        width = len(phrase)
        for i in range(len(tokens) - width + 1):
            if tokens[i:i + width] == phrase:
                return i
        return -1

    def _extract(self, para: str) -> str:
        tokens = para.lower().split(" ")
        found: list[tuple[int, int, str, str]] = []
        for surface, parts, gtype, order in self._entries:
            if len(parts) == 1:
                idx = tokens.index(surface) if surface in tokens else -1
            else:
                idx = self._first_subseq(tokens, parts)
            if idx >= 0:
                found.append((idx, order, surface, gtype))
        found.sort()
        lines = [
            f"{n}. {surface} | True | appears in the paragraph ({gtype})"
            for n, (_, _, surface, gtype) in enumerate(found, start=1)
        ]
        return "\n".join(lines) if lines else "1. none | False | no entities"

    def _verify_type(self, prompt: str) -> str:
        phrase = _last_between(prompt, PHRASE_MARK, " \nAnswer:")
        phrase = phrase.split(", Options:")[0].strip().lower()
        gtype = self.gazetteer.get(phrase)
        if gtype is None:
            return "unknown (UNK)"
        return f"{phrase} is a ({gtype})"

    def generate(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            if PHRASE_MARK in p:
                out.append(self._verify_type(p))
            else:
                out.append(self._extract(_last_between(p, PARA_MARK, ANSWER_MARK)))
        return out


class RetryingBackend:
    """M3 parity: bounded retry-with-backoff around any backend; a row
    that still fails yields the sentinel ``ERROR: <exc>`` instead of
    being dropped (resumability — failed rows are re-selected from the
    checkpoint manifest, SURVEY.md §4.2)."""

    FAIL_PREFIX = "ERROR: "

    def __init__(self, inner: Backend, retries: int = 3, backoff_s: float = 0.5,
                 sleep: Callable[[float], None] = time.sleep):
        self.inner, self.retries, self.backoff_s, self._sleep = (
            inner, retries, backoff_s, sleep)

    def generate(self, prompts: list[str]) -> list[str]:
        last: Exception | None = None
        for attempt in range(self.retries):
            try:
                return self.inner.generate(prompts)
            except Exception as exc:  # noqa: BLE001 — backend-agnostic boundary
                last = exc
                self._sleep(self.backoff_s * (2 ** attempt))
        return [f"{self.FAIL_PREFIX}{last}"] * len(prompts)


def default_backend_factory() -> Backend:
    return RetryingBackend(GazetteerBackend())
