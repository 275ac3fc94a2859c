"""Pure-Python oracle of the reference pipeline's deterministic semantics.

Every function here is dependency-free (stdlib only) and deterministic.
They serve two roles:

1. **UDF bodies** — the Spark operators in ``promptner_spark.operators``
   call these inside Arrow-batched pandas UDFs, so the distributed
   engine and the oracle share one implementation.
2. **Test oracles** — pytest replays the reference repo's checked-in
   raw LLM outputs (``results/*.csv``) through these functions and
   requires byte-identical IOB2 tag output.

Behavioral quirks of the reference are preserved on purpose (they are
part of the parity contract); each is called out in the docstrings with
a ``file:line`` citation into the reference repo.
"""

from .parsing import (
    numbered_list_items,
    truthy_of_output,
    parse_exemplar_answers,
)
from .align import (
    nth_index_in_str,
    nth_index_in_tokens,
    nth_subsequence_start,
    align_spans,
)
from .clean import clean_answers, normalized_eq, strip_bio_prefix
from .iob2 import parse_iob2_lines, render_iob2_lines
from .stopwords import ENGLISH_STOPWORDS

__all__ = [
    "numbered_list_items",
    "truthy_of_output",
    "parse_exemplar_answers",
    "nth_index_in_str",
    "nth_index_in_tokens",
    "nth_subsequence_start",
    "align_spans",
    "clean_answers",
    "normalized_eq",
    "strip_bio_prefix",
    "parse_iob2_lines",
    "render_iob2_lines",
    "ENGLISH_STOPWORDS",
]
