"""TF-IDF and inverted-index statistics over the ``documents`` table.

Training-data / retrieval operators (same family as text/analysis.py's
token stats): term frequencies, document frequencies, per-document top-k
TF-IDF terms, and per-term postings statistics. Tokenization is the
engine-portable explicit ASCII whitespace class shared with every other
text operator (analysis.WS_CLASS note — Java \\s and RE2 \\s disagree on
vertical tab).

Semantics fixed for the DuckDB oracles:

    tokens(d)   = maximal non-whitespace runs of text (case-sensitive;
                  the corpus is lowercase)
    tf(d, t)    = occurrences of t in d
    df(t)       = number of documents containing t
    idf(t)      = ln(N / df(t))            (natural log; df >= 1 always)
    tfidf(d, t) = ROUND(tf * idf, 6)

Top-k ranks on the ROUNDED score (DESC) with the term string (ASC) as the
tie-break: ranking on the rounded value makes the sort key exactly the
published value, so cross-engine rank stability reduces to cross-engine
value equality — the same contract every other rounded oracle relies on —
instead of depending on libm ulp agreement inside ln().

Scale design: one explode of the token stream, one (doc_id, term) groupBy
shuffle for tf, one term groupBy for df; N folds in as a 1-row broadcast
crossJoin (no driver collect). The top-k window partitions by doc_id —
per-document state only, never a global sort. All JVM-side expressions;
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from landscape_spark.text.analysis import NONWS_RUN


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(NONWS_RUN), 0)).alias(
            "term"
        ),
    )


def term_frequencies(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — one row per distinct term per document."""
    return _tokens(docs).groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-k terms by TF-IDF: (doc_id, term, tfidf, rk)."""
    tf = term_frequencies(docs)
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("_n").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("doc_id", "term", "tfidf", "rk")
    )


def term_postings(docs: DataFrame, min_df: int = 1) -> DataFrame:
    """Inverted-index statistics per term: document frequency, collection
    frequency, and the posting-list [min_doc, max_doc] span. The full
    posting lists themselves are the tf relation (term_frequencies) sorted
    by (term, doc_id); this operator is the dictionary/stats side an index
    builder ships with. One extra groupBy over the tf relation."""
    tf = term_frequencies(docs)
    out = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
    if min_df > 1:
        out = out.where(F.col("df") >= min_df)
    return out


def tfidf_topk_sql(k: int = 5) -> str:
    """DuckDB oracle for tfidf_topk (see module docstring for semantics)."""
    return rf"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, UNNEST(regexp_extract_all(text, '{NONWS_RUN}')) AS term
  FROM documents
),
tf AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
dfreq AS MATERIALIZED (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * LN((SELECT COUNT(*) FROM documents)::DOUBLE
                          / dfreq.df::DOUBLE), 6) AS tfidf
  FROM tf JOIN dfreq ON dfreq.term = tf.term
),
ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, term, tfidf, rk FROM ranked WHERE rk <= {k}
"""


def term_postings_sql(min_df: int = 1) -> str:
    """DuckDB oracle for term_postings. SUM(BIGINT) is HUGEINT in DuckDB —
    cast back to BIGINT to match Spark's long."""
    having = f"HAVING COUNT(*) >= {min_df}" if min_df > 1 else ""
    return rf"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, UNNEST(regexp_extract_all(text, '{NONWS_RUN}')) AS term
  FROM documents
),
tf AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
)
SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM tf GROUP BY term {having}
"""


def ngram_counts(docs: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide top-k word n-grams (ngram, cnt) — the corpus-statistics
    primitive behind contamination screens, boilerplate detection, and
    n-gram LM count tables. Words = the engine-portable WS_RUN split (the
    analysis.WS_CLASS law); ranking is (cnt desc, ngram asc), a total
    deterministic order. One projection (per-doc n-gram arrays, no
    shuffle) + one explode + one count aggregate + TakeOrderedAndProject."""
    from landscape_spark.text.analysis import WS_RUN

    n, k = int(n), int(k)
    words = F.filter(F.split(F.col("text"), WS_RUN), lambda x: x != F.lit(""))
    grams = F.when(
        F.size(F.col("words")) >= F.lit(n),
        F.expr(
            f"transform(sequence(0, size(words) - {n}),"
            f" i -> concat_ws(' ', slice(words, i + 1, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(words.alias("words"))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(k)
    )


def ngram_counts_sql(n: int = 2, k: int = 20) -> str:
    from landscape_spark.text.analysis import WS_RUN

    return rf"""
WITH w AS (
  SELECT list_filter(string_split_regex(text, '{WS_RUN}'), x -> x <> '') AS words
  FROM documents
),
g AS (
  SELECT UNNEST(CASE WHEN len(words) >= {n}
                THEN [array_to_string(words[i:i+{n - 1}], ' ')
                      FOR i IN range(1, len(words) - {n} + 2)]
                ELSE [] END) AS ngram
  FROM w
)
SELECT ngram, cnt FROM (
  SELECT ngram, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, ngram ASC) AS rn
  FROM g GROUP BY ngram
) WHERE rn <= {k}
"""


def term_zipf_alpha(docs: DataFrame, fmin: int = 3) -> DataFrame:
    """One row (fmin, n_tail, alpha): CSN continuous-MLE Zipf exponent of
    the corpus term-frequency distribution (alpha = 1 + n/Σ ln(f/(fmin-½))
    over terms with collection frequency >= fmin) — the text-side twin of
    graph/stats.py::degree_powerlaw_alpha; a healthy natural-language
    corpus sits near alpha ≈ 2, and boilerplate/spam floods shift it.
    One token explode + one term count + one global fold."""
    fmin = int(fmin)
    tf = _tokens(docs).groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    tail = tf.where(F.col("f") >= F.lit(fmin))
    return tail.agg(
        F.lit(fmin).alias("fmin"),
        F.count(F.lit(1)).alias("n_tail"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                1.0 + F.count(F.lit(1)) / F.sum(F.log(F.col("f") / F.lit(fmin - 0.5))),
                6,
            ),
        ).alias("alpha"),
    )


def term_zipf_alpha_sql(fmin: int = 3) -> str:
    from landscape_spark.text.analysis import NONWS_RUN

    return rf"""
WITH tf AS (
  SELECT term, COUNT(*) AS f FROM (
    SELECT UNNEST(regexp_extract_all(text, '{NONWS_RUN}')) AS term
    FROM documents
  ) GROUP BY term
)
SELECT {fmin} AS fmin, COUNT(*) AS n_tail,
       CASE WHEN COUNT(*) > 0 THEN
         ROUND(1.0 + COUNT(*) / SUM(LN(f / {fmin - 0.5})), 6)
       END AS alpha
FROM tf WHERE f >= {fmin}
"""
