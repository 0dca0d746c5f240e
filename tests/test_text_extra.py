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


def test_shingles_short_docs_have_none(spark):
    """Docs shorter than n emit NO shingles (Spark sequence(1,0) returns
    [1,0] with inferred step -1 — the unguarded form emitted a spurious
    whole-text shingle and diverged from the DuckDB oracle's empty range)."""
    from landscape_spark.text.dedup import ngram_jaccard_pairs, shingles

    df = spark.createDataFrame(
        [(0, ""), (1, ""), (2, "ab"), (3, "ab"), (4, "abcd")],
        "doc_id long, text string",
    )
    got = shingles(df).collect()
    assert {r.doc_id for r in got} == {4}
    assert sorted(r.sh for r in got) == ["abc", "bcd"]
    # two empty docs / two identical 1-2 char docs are NOT jaccard pairs
    assert ngram_jaccard_pairs(df, threshold=0.5).count() == 0


def test_simhash_empty_docs_excluded_from_pairs(spark):
    """Whitespace-only docs share the simhash-0 sentinel; they must not be
    reported as a hamming-0 near-dup clique."""
    from landscape_spark.text.dedup import simhash_near_pairs

    df = spark.createDataFrame(
        [(0, "   "), (1, ""), (2, "\t\n"), (3, "real content words here " * 5),
         (4, "real content words here " * 5 + "tail")],
        "doc_id long, text string",
    )
    pairs = {(r.doc_lo, r.doc_hi) for r in simhash_near_pairs(df, max_hamming=8).collect()}
    assert all(lo >= 3 for lo, hi in pairs), pairs  # no empty-doc pairs


def test_minhash_bands_validation(spark):
    from landscape_spark.text.dedup import minhash_lsh_dedup

    df = spark.createDataFrame([(0, "abcabcabc")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_dedup(df, num_hashes=8, bands=16)


def test_knn_small_corpus_excludes_self(spark):
    """N <= k: the query's own row must not vote in its own majority (the
    SQL oracle excludes self via vec_id <> vec_id)."""
    import numpy as np

    from landscape_spark.sim.knn import knn_exact_broadcast

    rng = np.random.default_rng(3)
    rows = []
    # 4 vectors, labels: self has label 9, all 3 neighbors label 1 — with
    # self included a k=5 majority could flip only if self's label tied
    base = rng.normal(size=8)
    for i, lab in enumerate([9, 1, 1, 1]):
        v = base + 0.01 * rng.normal(size=8)
        rows.append((i, (v / np.linalg.norm(v)).tolist(), lab))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label long")
    got = {r.vec_id: r.pred_label for r in knn_exact_broadcast(emb, k=5).collect()}
    assert got[0] == 1  # neighbors only; self's label 9 does not vote
