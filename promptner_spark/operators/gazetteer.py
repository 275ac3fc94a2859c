"""The deterministic mention-proposal dictionary behind the offline
"model" (operator M4, SURVEY.md §2.4).

The sandbox has no LLM API; the north rule demands deterministic,
byte-reproducible output. The extractor therefore proposes mentions
from a fixed gazetteer over the synthetic corpus vocabulary, rendered
in the reference's CoT answer format so the REAL parse/align path
(`utils.py:107-153`, `algorithms.py:72-131` semantics) is exercised
unchanged — swap :class:`~promptner_spark.operators.model.Backend`
for an API-backed one and nothing downstream moves.

Two configs:

- ``GAZETTEER`` — the full dictionary incl. multi-word phrases;
  drives `entry()`/bench and exercises SP1's subsequence + n-th
  occurrence quirks.
- ``ORACLE_GAZETTEER`` — single-word-only subset whose end-to-end
  pipeline semantics have a closed form in ANSI SQL (first occurrence
  of each distinct word per document), so the DuckDB oracle can check
  the ENTIRE infer→parse→align→mention chain value-exactly.
"""

from __future__ import annotations

# surface (lowercase) -> entity type. Insertion order is the
# deterministic tie-break for equal first-occurrence positions.
ORACLE_GAZETTEER: dict[str, str] = {
    "spark": "SYSTEM",
    "customer": "ACTOR",
    "table": "STRUCT",
    "column": "STRUCT",
    "vector": "STRUCT",
    "stream": "SOURCE",
    "batch": "SOURCE",
    "window": "OP",
    "filter": "OP",
    "merge": "OP",
}

# Multi-word additions (full pipeline only): exercise the reference's
# token-subsequence alignment (`algorithms.py:113-129`) including the
# -1-on-more-than-n quirk of `utils.py:33-34`.
MULTIWORD_GAZETTEER: dict[str, str] = {
    "hash join": "OP",
    "table scan": "OP",
    "sort merge": "OP",
}

GAZETTEER: dict[str, str] = {**ORACLE_GAZETTEER, **MULTIWORD_GAZETTEER}

# Alias dictionary for entity linking (J1): surface-normal → canonical
# entity. Deliberately includes aliases that collide in type and a
# heavy-head entity ("spark") so the skew path is exercised.
ALIAS_ROWS: list[tuple[str, int, str, float]] = [
    ("spark", 1, "Apache Spark", 0.9),
    ("customer", 2, "Customer", 0.8),
    ("table", 3, "Table", 0.7),
    ("column", 4, "Column", 0.7),
    ("vector", 5, "Vector", 0.6),
    ("stream", 6, "Stream", 0.6),
    ("batch", 7, "Batch", 0.6),
    ("window", 8, "Window Operator", 0.5),
    ("filter", 9, "Filter Operator", 0.5),
    ("merge", 10, "Merge Operator", 0.5),
    ("hash join", 11, "Hash Join", 0.5),
    ("table scan", 12, "Table Scan", 0.5),
    ("sort merge", 13, "Sort Merge", 0.5),
]

# The same alias table as a DuckDB VALUES clause (oracle side).
DUCKDB_ALIASES_CTE = (
    "aliases(alias_norm, entity_id, canonical_name, prior) AS (VALUES "
    + ", ".join(
        f"('{a}', {i}, '{n}', {p})" for a, i, n, p in ALIAS_ROWS
    )
    + ")"
)


def scaled_gazetteer(n_variants: int) -> dict[str, str]:
    """Vocabulary-scaled gazetteer for the scaling bench: every
    single-word surface gains ``n_variants - 1`` suffixed variants
    (``sparkv3``) matching the per-replica token perturbation of
    ``sources/pages.py::synthesize_pages(perturb_vocab=True)``.

    Replicating a corpus repeats its surfaces, so the vocabulary-level
    KG stages (linking resolution, canonicalization, triple counting)
    stay O(20) no matter the replicate factor and read as fixed
    latency in a scaling measurement. A real web corpus's vocabulary
    grows with the data (Zipf); this makes the synthetic one do the
    same, so those stages carry replica-proportional data and
    distribute. Multiword phrases stay unscaled (they exercise
    alignment quirks, not vocabulary volume)."""
    out = dict(GAZETTEER)
    for r in range(1, n_variants):
        for s, t in ORACLE_GAZETTEER.items():
            out[f"{s}v{r}"] = t
    return out


def scaled_alias_rows(n_variants: int) -> list[tuple[str, int, str, float]]:
    """Alias table matching :func:`scaled_gazetteer`: each variant
    surface links to its own entity (distinct id + canonical name), so
    the entity space — and therefore the distinct-triple space — also
    scales ×n_variants."""
    rows = list(ALIAS_ROWS)
    base_single = [(a, i, n, p) for a, i, n, p in ALIAS_ROWS if " " not in a]
    for r in range(1, n_variants):
        for a, i, n, p in base_single:
            rows.append((f"{a}v{r}", i + 1000 * r, f"{n} v{r}", p))
    return rows


def duckdb_gazetteer_cte(gaz: dict[str, str] | None = None) -> str:
    """The (single-word) gazetteer as a DuckDB VALUES CTE."""
    gaz = gaz if gaz is not None else ORACLE_GAZETTEER
    vals = ", ".join(f"('{s}', '{t}')" for s, t in gaz.items())
    return f"gaz(surface, type) AS (VALUES {vals})"
