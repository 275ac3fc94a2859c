"""Structured-Streaming surface (extension beyond the reference).

The reference is strictly batch (SURVEY.md §2.10: no streaming
semantics), and the north_rule's resumability is met by checkpointed
batch stages. This package adds the streaming ingest path a continuous
crawl feed would use: same extraction operators, incremental source,
watermarked windowed aggregation, exactly-once file sink via the
streaming checkpoint, and custom stateful operators
(``applyInPandasWithState``: streaming first-seen dedup, incremental
entity cards).
"""

from .ingest import (  # noqa: F401
    mention_rate_by_type,
    stream_mentions,
    stream_pages,
    write_mentions_stream,
)
from .stateful import (  # noqa: F401
    stream_dedup_first_seen,
    stream_entity_cards,
)
