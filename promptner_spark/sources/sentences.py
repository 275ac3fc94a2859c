"""Document → sentence chunking (pure SQL expressions, no UDF).

The reference operates on pre-sentencized gold corpora; web pages are
paragraphs. Chunk the token stream into fixed windows so (a) prompts
stay bounded, (b) triple emission has a sentence-level co-occurrence
scope (G3). Deterministic and codegen'd: split → sequence → transform
→ posexplode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SENT_TOKENS = 25


def split_sentences(pages: DataFrame, sent_tokens: int = SENT_TOKENS,
                    carry: tuple[str, ...] = ()) -> DataFrame:
    """pages(url, text, ...) → (url, sent_id, text) one row per chunk
    of ``sent_tokens`` tokens. ``carry`` copies extra page columns
    (e.g. ``warc_ts`` for streaming event-time) onto every chunk row —
    a projection, not a join."""
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(sent_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * sent_tokens + 1, sent_tokens)),
    )
    return (
        pages
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("url", *carry,
                F.posexplode(chunks).alias("sent_id", "sent_text"))
        .select("url", F.col("sent_id").cast("int").alias("sent_id"),
                F.col("sent_text").alias("text"), *carry)
    )
