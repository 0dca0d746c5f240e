"""Text-analysis operators for the training-data pipeline over ``documents``.

Every operator here is a pure column expression (JVM-side, whole-stage
codegen — no Python in the hot path) with an exactly-matching DuckDB oracle.
These are first-class engine ops per the task brief (language-ID heuristic,
quality scoring, token counting, fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java regex \s (default flags) is [ \t\n\x0B\f\r] — it INCLUDES vertical tab
# \x0B — while RE2 (DuckDB's regex engine, which runs every oracle here) has
# \s = [ \t\n\f\r] WITHOUT it. A document containing VT would therefore
# tokenize differently on the two engines if any expression used \s/\S, so
# every tokenizing regex spells the ASCII class out explicitly: the same
# pattern source parses identically in Java regex and RE2 (both support \xhh
# escapes inside classes), making the whitespace definition engine-portable
# by construction. The simhash kernel's byte LUT (dedup._WS_LUT) uses the
# same six byte values.
WS_CLASS = r"[ \t\n\x0B\f\r]"
WS_RUN = WS_CLASS + "+"
NONWS_RUN = r"[^ \t\n\x0B\f\r]+"

# language marker tokens for the n-gram/stopword heuristic (fixed public lists)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que"],
    "es": ["el", "la", "los", "que", "es", "en", "por", "con"],
}

STOPWORDS = LANG_MARKERS["en"]


def token_count_col(text: Column) -> Column:
    """Whitespace token count of the GIVEN column: number of maximal
    non-whitespace runs (explicit ASCII class — see WS_CLASS note; \\S+
    would silently include VT on Spark but not in the RE2 oracles). (The
    former F.expr form hard-coded the literal column name 'text', silently
    ignoring this parameter for any other column.)"""
    return F.size(F.regexp_extract_all(text, F.lit(NONWS_RUN), 0))


def _count_word(text: Column, word: str) -> Column:
    # count of whole-word occurrences, case-sensitive (documents are lowercase)
    return F.size(F.regexp_extract_all(text, F.lit(f"\\b{word}\\b"), 0))


def with_token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_measured, stop_tokens, punct_chars)."""
    text = F.col("text")
    stop_total = None
    for w in STOPWORDS:
        c = _count_word(text, w)
        stop_total = c if stop_total is None else stop_total + c
    return docs.select(
        "doc_id",
        token_count_col(text).alias("n_tokens"),
        F.length(text).alias("n_chars_measured"),
        stop_total.alias("stop_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[.,;:!?]', 0)")).alias("punct_chars"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Deterministic quality score in [0,1]:
    0.4*min(n_tokens/200,1) + 0.3*(1 - min(stop_ratio*4,1)) + 0.3*min(punct_ratio*50,1)
    — a length/stopword/punctuation composite (rounded to 6 for cross-engine
    float stability)."""
    s = with_token_stats(docs)
    nt = F.col("n_tokens").cast("double")
    stop_ratio = F.when(nt > 0, F.col("stop_tokens") / nt).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.col("n_chars_measured") > 0,
        F.col("punct_chars") / F.col("n_chars_measured").cast("double"),
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(nt / F.lit(200.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(stop_ratio * 4, F.lit(1.0)))
        + F.lit(0.3) * F.least(punct_ratio * 50, F.lit(1.0))
    )
    return s.select("doc_id", F.round(score, 6).alias("quality"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-token language heuristic: language with the highest whole-word
    marker count wins; ties broken by language code order; zero markers ->
    'und' (undetermined)."""
    text = F.col("text")
    counts = []
    for lang, words in sorted(LANG_MARKERS.items()):
        total = None
        for w in words:
            c = _count_word(text, w)
            total = c if total is None else total + c
        counts.append((lang, total))
    best = F.greatest(*[c for _, c in counts])
    pred = F.lit("und")
    for lang, c in reversed(counts):  # earlier langs override on ties
        pred = F.when((best > 0) & (c == best), F.lit(lang)).otherwise(pred)
    return docs.select("doc_id", pred.alias("pred_lang"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprint: md5 hex of the text bytes (exact-dup key)."""
    return docs.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fp")
    )


# ---------------------------------------------------------------------------
# matching DuckDB oracle SQL
# ---------------------------------------------------------------------------

def _stop_sql(words: list[str]) -> str:
    return " + ".join(
        rf"length(regexp_extract_all(text, '\b{w}\b'))" for w in words
    )


TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       length(regexp_extract_all(text, '{NONWS_RUN}')) AS n_tokens,
       length(text) AS n_chars_measured,
       {_stop_sql(STOPWORDS)} AS stop_tokens,
       length(regexp_extract_all(text, '[.,;:!?]')) AS punct_chars
FROM documents
"""

QUALITY_SQL = rf"""
WITH s AS ({TOKEN_STATS_SQL})
SELECT doc_id,
       ROUND(
         0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 200.0, 1.0)
         + 0.3 * (1.0 - LEAST(
             (CASE WHEN n_tokens > 0
                   THEN CAST(stop_tokens AS DOUBLE) / n_tokens ELSE 0.0 END) * 4, 1.0))
         + 0.3 * LEAST(
             (CASE WHEN n_chars_measured > 0
                   THEN CAST(punct_chars AS DOUBLE) / n_chars_measured ELSE 0.0 END) * 50, 1.0)
       , 6) AS quality
FROM s
"""


def _lang_id_sql() -> str:
    cols = []
    for lang, words in sorted(LANG_MARKERS.items()):
        cols.append(f"({_stop_sql(words)}) AS cnt_{lang}")
    langs = sorted(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"cnt_{lang}" for lang in langs) + ")"
    pred = "'und'"
    for lang in reversed(langs):
        pred = f"CASE WHEN best > 0 AND cnt_{lang} = best THEN '{lang}' ELSE {pred} END"
    return f"""
WITH c AS (SELECT doc_id, {", ".join(cols)} FROM documents),
b AS (SELECT doc_id, *, {best} AS best FROM c)
SELECT doc_id, {pred} AS pred_lang FROM b
"""


LANG_ID_SQL = _lang_id_sql()

FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fp FROM documents"


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals (Rae et al. 2021,
    public filter family), word-level (the synthetic corpus has no line
    structure): (doc_id, dup_word_frac, top_bigram_frac).

    * dup_word_frac: 1 - distinct_words / total_words — mass of repeated
      vocabulary (0 for empty docs).
    * top_bigram_frac: occurrences of the most frequent word bigram /
      total bigrams (0 when fewer than 2 words). Only the max COUNT is
      emitted, so no tie-break is needed.

    Pure JVM column expressions over the split word array — no shuffle, no
    UDF; the whole thing is one projection over the scan. The top-bigram
    count is array_sort + ONE aggregate pass tracking the longest equal-run
    (max run length in the sorted list == max multiplicity): O(L log L) per
    row. The previous form — aggregate over array_distinct re-scanning the
    full bigram list per distinct bigram — was O(L^2) per doc, so a single
    100k-word outlier (exactly the doc class a repetition filter exists to
    catch) cost ~10^10 comparisons inside one task."""
    words = F.filter(F.split(F.col("text"), WS_RUN), lambda x: x != F.lit(""))
    w = F.expr("words")
    nw = F.size(w)
    distinct_frac = F.when(
        nw > 0,
        F.lit(1.0) - F.size(F.array_distinct(w)).cast("double") / nw.cast("double"),
    ).otherwise(F.lit(0.0))
    bigrams = F.expr(
        "transform(sequence(0, size(words) - 2), i -> words[i] || ' ' || words[i+1])"
    )
    # longest equal-run over the sorted bigram list; run/best fold in one pass
    top_cnt = F.expr(
        "aggregate(array_sort(bigrams),"
        " struct(0 AS best, 0 AS run, CAST(NULL AS STRING) AS prev),"
        " (acc, x) -> struct("
        "   greatest(acc.best, IF(acc.prev IS NOT NULL AND x = acc.prev,"
        "                         acc.run + 1, 1)) AS best,"
        "   IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, 1) AS run,"
        "   x AS prev),"
        " acc -> acc.best)"
    )
    top_frac = F.when(
        F.size(F.col("bigrams")) > 0,
        top_cnt.cast("double") / F.size(F.col("bigrams")).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        docs.select("doc_id", words.alias("words"))
        .withColumn("bigrams", F.when(nw >= 2, bigrams).otherwise(F.array()))
        .select(
            "doc_id",
            F.round(distinct_frac, 6).alias("dup_word_frac"),
            F.round(top_frac, 6).alias("top_bigram_frac"),
        )
    )


REPETITION_SQL = rf"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '{WS_RUN}'), x -> x <> '') AS words
  FROM documents
),
uni AS (
  SELECT doc_id,
         CASE WHEN len(words) > 0
              THEN 1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / len(words)
              ELSE 0.0 END AS dup_word_frac,
         CASE WHEN len(words) >= 2
              THEN [words[i] || ' ' || words[i+1] FOR i IN range(1, len(words))]
              ELSE [] END AS bigrams
  FROM w
),
top AS (
  SELECT doc_id, dup_word_frac,
         CASE WHEN len(bigrams) > 0
              THEN CAST(list_aggregate(
                     list_transform(list_distinct(bigrams),
                       b -> len(list_filter(bigrams, x -> x = b))),
                     'max') AS DOUBLE) / len(bigrams)
              ELSE 0.0 END AS top_bigram_frac
  FROM uni
)
SELECT doc_id, ROUND(dup_word_frac, 6) AS dup_word_frac,
       ROUND(top_bigram_frac, 6) AS top_bigram_frac
FROM top
"""


# GPT-2-style pre-tokenizer shape, restricted to the Java-regex/RE2 common
# subset (no lookahead, ASCII classes): letter runs / digit runs / symbol
# runs, each merging one preceding space, plus residual whitespace runs.
# The full GPT-2 pattern's contraction splits and \p{L} classes need
# lookahead, which RE2 (the DuckDB oracle engine) lacks — this is the
# standard lookahead-free approximation and counts within a few percent of
# a real BPE pre-tokenizer on English text. Whitespace is the explicit
# WS_CLASS, not \s — see the note at the top of this module.
BPE_ISH_RE = (
    r" ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\x0B\f\rA-Za-z0-9]+" + "|" + WS_RUN
)


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bpe_tokens): BPE-ish pre-tokenization count — the
    token-budget estimator a training-data pipeline runs corpus-wide
    (whitespace counts undercount punctuation-heavy text badly). Pure JVM
    regexp projection, no shuffle."""
    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_RE), 0)
        ).alias("n_bpe_tokens"),
    )


BPE_TOKEN_COUNT_SQL = rf"""
SELECT doc_id,
       length(regexp_extract_all(text, '{BPE_ISH_RE}')) AS n_bpe_tokens
FROM documents
"""
