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
