"""Session construction — canonical home is promptner_spark.session;
re-exported here because plan-level code (and the verify recipe)
reaches for it next to the pipelines."""

from ..session import ARROW_BATCH_ROWS, build_session

__all__ = ["build_session", "ARROW_BATCH_ROWS"]
