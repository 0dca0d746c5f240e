"""PII scrubbing: planted-PII redaction correctness + count parity."""

from __future__ import annotations

from landscape_spark.text.pii import pii_scrub


def test_pii_scrub_planted(spark):
    rows = [
        (0, "write to jane.roe+tag@sub.example.co.uk today"),
        (1, "hosts 192.168.1.254 and 8.8.8.8 are up"),
        (2, "call 555-123-4567 or 555 987 6543 now"),
        (3, "clean text, nothing to redact"),
        (4, ""),
        (5, None),
        (6, "a@b.cd next to 1.2.3.4 and 111-222-3333 all at once"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got[0].clean_text == "write to <EMAIL> today"
    assert (got[0].n_emails, got[0].n_ips, got[0].n_phones) == (1, 0, 0)
    assert got[1].clean_text == "hosts <IP> and <IP> are up"
    assert got[1].n_ips == 2
    assert got[2].clean_text == "call <PHONE> or <PHONE> now"
    assert got[2].n_phones == 2
    assert got[3].clean_text == rows[3][1]
    assert got[4].clean_text == ""
    assert got[5].clean_text is None  # null text passes through as null
    assert got[6].clean_text == "<EMAIL> next to <IP> and <PHONE> all at once"
    assert (got[6].n_emails, got[6].n_ips, got[6].n_phones) == (1, 1, 1)
