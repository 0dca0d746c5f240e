"""Rolling-hash fingerprint: JVM-side sequential fold vs pure-Python reference."""

from __future__ import annotations

from landscape_spark.entry_queries import q_rolling_fingerprint

B, M = 131, (1 << 31) - 1


def _py_rolling(text: str) -> int:
    h = 0
    for ch in text:
        h = (h * B + ord(ch)) % M
    return h


def test_rolling_fingerprint_matches_python(spark, sf_small):
    got = {r.doc_id: r.rolling_fp for r in q_rolling_fingerprint(spark, sf_small).collect()}
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    for r in docs:
        assert got[r.doc_id] == _py_rolling(r.text), f"doc {r.doc_id}"


def test_rolling_fingerprint_discriminates(spark, sf_small):
    vals = [r.rolling_fp for r in q_rolling_fingerprint(spark, sf_small).collect()]
    assert len(set(vals)) > 0.9 * len(vals)  # near-unique on distinct docs
