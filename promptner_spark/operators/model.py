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


# A chat transcript is [(content, role)] — the reference's message
# tuple order (`models.py:22-25`).
Messages = list[tuple[str, str]]


def is_chat_backend(backend: object) -> bool:
    """Reference dispatch (`models.py:43-52` ``is_chat``/``__call__``):
    backends without the predicate are completion-style."""
    fn = getattr(backend, "is_chat", None)
    return bool(fn()) if callable(fn) else False


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
        # Precompute lookup structures once per instance (per executor
        # task). Single-word surfaces go in a dict so extraction is
        # O(sentence tokens), not O(gazetteer) — load-bearing for the
        # vocabulary-scaled bench gazetteer (thousands of entries);
        # only multiword phrases need the subsequence scan.
        self._single: dict[str, tuple[str, int]] = {}
        self._multi: list[tuple[str, list[str], str, int]] = []
        for order, (surface, gtype) in enumerate(self.gazetteer.items()):
            parts = surface.split(" ")
            if len(parts) == 1:
                self._single[surface] = (gtype, order)
            else:
                self._multi.append((surface, parts, gtype, order))

    def _first_subseq(self, tokens: list[str], phrase: list[str]) -> int:
        width = len(phrase)
        for i in range(len(tokens) - width + 1):
            if tokens[i:i + width] == phrase:
                return i
        return -1

    def _extract(self, para: str) -> str:
        tokens = para.lower().split(" ")
        found: list[tuple[int, int, str, str]] = []
        seen: set[str] = set()
        for idx, tok in enumerate(tokens):   # first occurrence per word
            if tok not in seen and tok in self._single:
                seen.add(tok)
                gtype, order = self._single[tok]
                found.append((idx, order, tok, gtype))
        for surface, parts, gtype, order in self._multi:
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


class OpenAIBackend:
    """M1: OpenAI-API-shaped adapter (reference `models.py:10-52`).

    The HTTP layer is an injected ``transport(endpoint, payload) ->
    response_dict`` so the adapter is fully offline-testable (the
    sandbox has no network); the default transport POSTs
    ``{api_base}{endpoint}`` with the bearer key from ``api_key_env``
    via urllib. Request/response shapes follow the reference exactly:

    - completion (`models.py:17-18`): POST /completions with
      ``{model, prompt, max_tokens}``; decode ``choices[0].text``
      (`models.py:29-33`).
    - chat (`models.py:21-26`): POST /chat/completions with the
      ``[(content, role)]`` tuples rendered to role/content dicts;
      decode ``choices[0].message.content``.
    - ``is_chat`` (`models.py:43-45`): by model name.

    The batch interface receives one Arrow batch per call; requests
    are issued per prompt (the API is per-request — a smarter
    transport may parallelize), which replaces the reference's
    3.01 s-throttled sequential loop (`models.py:15`, `run.py:26`)."""

    CHAT_MODELS = ("gpt-4", "gpt-3.5-turbo")

    def __init__(self, model: str = "gpt-3.5-turbo",
                 transport: Callable[[str, dict], dict] | None = None,
                 api_base: str = "https://api.openai.com/v1",
                 api_key_env: str = "OPENAI_API_KEY",
                 max_tokens: int = 250):
        self.model = model
        self.api_base = api_base
        self.api_key_env = api_key_env
        self.max_tokens = max_tokens
        self._transport = transport or self._http_transport

    def _http_transport(self, endpoint: str, payload: dict) -> dict:
        import json
        import os
        import urllib.request
        req = urllib.request.Request(
            self.api_base + endpoint,
            data=json.dumps(payload).encode("utf-8"),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {os.environ.get(self.api_key_env, '')}",
            })
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def is_chat(self) -> bool:
        return self.model in self.CHAT_MODELS

    def generate(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            resp = self._transport("/completions", {
                "model": self.model, "prompt": p,
                "max_tokens": self.max_tokens})
            out.append(resp["choices"][0]["text"])
        return out

    def generate_chat(self, batches: list[Messages]) -> list[str]:
        out = []
        for msgs in batches:
            resp = self._transport("/chat/completions", {
                "model": self.model,
                "messages": [{"role": role, "content": content}
                             for content, role in msgs]})
            out.append(resp["choices"][0]["message"]["content"])
        return out


class HFBackend:
    """M2: HuggingFace-generate-shaped adapter (`models.py:55-68`):
    wraps a ``query(prompt) -> str`` callable (tokenize → generate →
    batch_decode in the reference). Construct with any callable for
    offline tests, or :meth:`from_pretrained` (import-gated — the
    sandbox has no transformers/torch) for the real seq2seq path."""

    def __init__(self, query_fn: Callable[[str], str]):
        self._query = query_fn

    def is_chat(self) -> bool:
        return False

    def generate(self, prompts: list[str]) -> list[str]:
        return [self._query(p) for p in prompts]

    @classmethod
    def from_pretrained(cls, name: str = "google/flan-t5-large",
                        max_new_tokens: int = 200,
                        model_max_length: int = 600,
                        device: str = "cpu") -> "HFBackend":
        """Reference `models.py:55-68` (T5/flan family): one instance
        per executor task — pair with ``backend_factory`` so the model
        loads once per task, not per row."""
        try:
            from transformers import AutoModelForSeq2SeqLM, AutoTokenizer
        except ImportError as exc:  # pragma: no cover - no HF in sandbox
            raise ImportError(
                "HFBackend.from_pretrained needs the 'transformers' "
                "package; construct HFBackend(query_fn) directly for "
                "offline use") from exc
        tokenizer = AutoTokenizer.from_pretrained(
            name, model_max_length=model_max_length)
        model = AutoModelForSeq2SeqLM.from_pretrained(name).to(device)

        def query(prompt: str) -> str:
            inputs = tokenizer(prompt, return_tensors="pt").to(device)
            outputs = model.generate(**inputs, max_new_tokens=max_new_tokens)
            return tokenizer.batch_decode(
                outputs, skip_special_tokens=True)[0]

        return cls(query)


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

    def _with_retry(self, fn: Callable[[], list[str]], n: int) -> list[str]:
        last: Exception | None = None
        for attempt in range(self.retries):
            try:
                return fn()
            except Exception as exc:  # noqa: BLE001 — backend-agnostic boundary
                last = exc
                self._sleep(self.backoff_s * (2 ** attempt))
        return [f"{self.FAIL_PREFIX}{last}"] * n

    def generate(self, prompts: list[str]) -> list[str]:
        return self._with_retry(
            lambda: self.inner.generate(prompts), len(prompts))

    def generate_chat(self, batches: list[Messages]) -> list[str]:
        return self._with_retry(
            lambda: self.inner.generate_chat(batches), len(batches))

    def is_chat(self) -> bool:
        return is_chat_backend(self.inner)


def generate_any(backend: Backend, prompts: list[str]) -> list[str]:
    """Dispatch a completion-style prompt list to either interface:
    chat backends receive each prompt as a single user turn (the
    template task text already embeds definition + format, so the
    chat envelope carries it verbatim — used by the C7/C8 verify and
    dispute queries, reference `algorithms.py:403-424`)."""
    if is_chat_backend(backend):
        return backend.generate_chat([[(p, "user")] for p in prompts])
    return backend.generate(prompts)


def default_backend_factory() -> Backend:
    return RetryingBackend(GazetteerBackend())
