"""RetryingBackend (M3) semantics: bounded retry with backoff, and
failures become visible sentinel rows (never dropped — the reference
swallows them via a bare IndexError, `run.py:43-44`)."""

from __future__ import annotations


class Flaky:
    def __init__(self, fail_times: int):
        self.fail_times = fail_times
        self.calls = 0

    def generate(self, prompts):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise RuntimeError("rate limited")
        return [f"ok:{p}" for p in prompts]


def test_retry_succeeds_after_transient_failures():
    from promptner_spark.operators.model import RetryingBackend

    sleeps = []
    rb = RetryingBackend(Flaky(2), retries=3, backoff_s=0.5,
                         sleep=sleeps.append)
    assert rb.generate(["a", "b"]) == ["ok:a", "ok:b"]
    assert sleeps == [0.5, 1.0]  # exponential-ish backoff, no real sleep


def test_exhausted_retries_yield_error_rows_not_drops():
    from promptner_spark.operators.model import RetryingBackend
    from promptner_spark.operators.parse import predict_tags

    rb = RetryingBackend(Flaky(99), retries=2, backoff_s=0.0,
                         sleep=lambda _s: None)
    out = rb.generate(["a", "b"])
    assert len(out) == 2
    assert all(o.startswith(RetryingBackend.FAIL_PREFIX) for o in out)
    # downstream: sentinel rows align to all-O tags, row stays visible
    assert predict_tags("two tokens", out[0]) == ["O", "O"]
