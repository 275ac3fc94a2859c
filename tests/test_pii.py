"""PII scrubbing (operators/pii.py): hand-case semantics, redaction
order, count/scrub consistency, and the scale contract (map-only —
the plan contains no exchange)."""

from __future__ import annotations

from promptner_spark.operators.pii import scrub_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_hand_case(spark):
    docs = _docs(spark, [
        (1, "mail me at jo.smith+x@sub.example.co.uk or call "
            "+44 20 7946 0958 today"),
        (2, "server 192.168.0.1 and 10.0.0.255 are up"),
        (3, "nothing sensitive here"),
        (4, "user@host.org user@host.org"),
    ])
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["text"] == "mail me at <EMAIL> or call <PHONE> today"
    assert out[2]["n_ipv4"] == 2
    assert out[2]["text"] == "server <IP> and <IP> are up"
    assert out[3]["text"] == "nothing sensitive here"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) \
        == (0, 0, 0)
    # non-overlapping repeats each count and each redact
    assert out[4]["n_email"] == 2
    assert out[4]["text"] == "<EMAIL> <EMAIL>"


def test_email_with_dotted_quad_domain_scrubs_whole_address(spark):
    """Redaction order: the email pass runs before the IPv4 pass, so
    user@192.168.0.1 disappears as ONE email, not as an orphaned
    local part next to an <IP> token."""
    docs = _docs(spark, [(1, "ping admin@192.168.0.1 now")])
    row = scrub_pii(docs).collect()[0]
    assert row["text"] == "ping <EMAIL> now"
    # counts are measured on the ORIGINAL text: the dotted quad is
    # still reported as an IP sighting even though the email pass
    # consumed it first.
    assert row["n_email"] == 1 and row["n_ipv4"] == 1


def test_plan_is_map_only(spark):
    docs = _docs(spark, [(1, "a@b.co")])
    plan = scrub_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
