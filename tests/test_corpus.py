"""Corpus curation: deterministic sampling stability + decontamination."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from landscape_spark.text.corpus import (
    decontaminate,
    deterministic_sample,
    stratified_sample,
)


def test_sample_invariant_to_partitioning(spark):
    """The whole point vs df.sample: the selected set must not change when
    the partitioning does (df.sample is seeded per partition and would)."""
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    a = {r.doc_id for r in deterministic_sample(docs, 0.3).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), 0.3).collect()
    }
    c = {
        r.doc_id
        for r in deterministic_sample(docs.coalesce(1), 0.3).collect()
    }
    assert a == b == c
    # fraction roughly honored (md5 uniformity; 2000 draws, p=0.3)
    assert 0.25 < len(a) / 2000 < 0.35
    # different seed -> different (mostly) set
    d = {r.doc_id for r in deterministic_sample(docs, 0.3, seed=7).collect()}
    assert d != a


def test_stratified_sample_rates_and_determinism(spark):
    rng = random.Random(3)
    rows = [(i, "t", rng.choice(["en", "de", "fr"])) for i in range(3000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = stratified_sample(
        docs, {"en": 1.0, "de": 0.5, "fr": 0.0}, strata_col="lang"
    )
    got = {(r.doc_id, r.lang) for r in out.select("doc_id", "lang").collect()}
    by_lang = {}
    for _, lang in got:
        by_lang[lang] = by_lang.get(lang, 0) + 1
    n_en = sum(1 for _, _, l in rows if l == "en")
    n_de = sum(1 for _, _, l in rows if l == "de")
    assert by_lang.get("en", 0) == n_en  # fraction 1.0 keeps everything
    assert "fr" not in by_lang  # fraction 0.0 drops everything
    assert 0.4 * n_de < by_lang.get("de", 0) < 0.6 * n_de
    # stable across reruns
    again = {(r.doc_id, r.lang) for r in out.select("doc_id", "lang").collect()}
    assert got == again


def test_decontaminate_flags_exact_ngram_overlap(spark):
    rng = random.Random(11)

    def txt(n):
        return "".join(rng.choice("abcdefghij ") for _ in range(n))

    eval_doc = txt(300)
    rows = [
        (0, txt(200) + eval_doc[100:180] + txt(150)),  # contains 80-char span
        (1, txt(400)),  # clean
        (2, eval_doc),  # the benchmark doc itself
        (3, txt(40)),  # shorter than n: can never be contaminated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.where("doc_id = 2")
    got = {r.doc_id: r.contaminated for r in decontaminate(docs, bench, n=64).collect()}
    assert got[0] is True  # 80-char shared span contains 64-grams
    assert got[1] is False
    assert got[2] is True  # bench doc shares with itself
    assert got[3] is False


def test_decontaminate_fp_path_matches_shingle_semantics(spark):
    """The rolling-fingerprint candidate pass + exact verify must be
    bit-identical to the plain char-shingle join definition — including on
    multibyte text, where byte windows can match across char boundaries
    that char shingles would not (verification removes those)."""
    from landscape_spark.text.dedup import shingles

    rng = random.Random(23)

    def txt(k, alpha="abcdefgh о å 字"):
        return "".join(rng.choice(alpha) for _ in range(k))

    shared = txt(90)
    rows = [
        (0, txt(100) + shared + txt(50)),   # contaminated (90-char span)
        (1, txt(300)),                       # likely clean
        (2, shared),                         # the bench doc content itself
        (3, txt(200) + shared[:63]),         # 63-char overlap: NOT enough
        (4, txt(30)),                        # too short for 64-grams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(100, shared)], "doc_id long, text string")
    n = 64
    # reference: the plain shingle-join definition (the oracle's shape)
    bench_sh = shingles(bench, n=n).select("sh").distinct()
    ref_hits = {
        r.doc_id
        for r in shingles(docs, n=n)
        .join(bench_sh, on="sh", how="left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    }
    want = {i: (i in ref_hits) for i, _ in rows}
    got = {
        r.doc_id: r.contaminated
        for r in decontaminate(docs, bench, n=n).collect()
    }
    assert got == want
    assert got[0] is True and got[3] is False and got[4] is False
    # w.h.p. path (no exact verify) may only ADD byte-window hits, never
    # lose a truly contaminated doc
    loose = {
        r.doc_id: r.contaminated
        for r in decontaminate(docs, bench, n=n, exact_verify=False).collect()
    }
    assert all(loose[i] for i in ref_hits)
