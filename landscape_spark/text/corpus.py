"""Corpus-curation operators: deterministic sampling and decontamination.

Two operations every large-scale training-data pipeline runs between dedup
and tokenization:

* **Deterministic (stratified) sampling.** Spark's ``df.sample`` is seeded
  per PARTITION — the selected row set changes whenever the partitioning
  does (a repartition, a different file split, AQE coalescing), which makes
  pipeline reruns non-reproducible at exactly the moment you scale the
  cluster. Content-keyed sampling (hash of a stable key vs a threshold) is
  invariant to partitioning, executors, and row order, and is expressible
  as a pure column predicate (pushdown-friendly, zero shuffle). The key
  hash here is md5 — identical in Spark and DuckDB, so the gate oracle is
  exact — and the threshold comparison happens on the HEX STRING prefix
  (lowercase-hex lexicographic order == numeric order), sidestepping
  engine-specific hex→int casts.

* **Decontamination** (train/eval overlap removal, the Lee et al. /
  GPT-3-appendix concern): drop training documents sharing any exact
  character n-gram of length >= n with a benchmark/eval set. Shape: the
  benchmark side is tiny (eval suites), so its distinct n-gram set
  broadcast-joins against the corpus shingle stream — one scan of the
  corpus, no all-pairs anything. Exact by construction, so the oracle is
  plain SQL over the same shingle definition (text/dedup.shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 15  # 60 bits of the md5 — threshold resolution 16^-15


def _threshold_hex(fraction: float) -> str:
    """fraction in [0,1] -> lowercase-hex threshold string such that
    P(md5_prefix < threshold) = fraction (up to 2^-60). fraction >= 1 maps
    to "g" — lexicographically above every hex string (the alphabet is
    0-9a-f), so everything passes; the naive format would produce a
    16-digit "1000..." whose string comparison is NOT numeric."""
    f = min(max(float(fraction), 0.0), 1.0)
    if f >= 1.0:
        return "g"
    return format(int(f * (16**_HEX_DIGITS)), f"0{_HEX_DIGITS}x")


def _key_hex(key_col: str, seed: int) -> F.Column:
    # md5 of "<key>:<seed>" — a STRING concat so Spark and DuckDB hash
    # identical bytes; the first 15 hex chars are the sampling variate
    return F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}")).cast("binary")),
        1,
        _HEX_DIGITS,
    )


def deterministic_sample(
    docs: DataFrame,
    fraction: float,
    seed: int = 42,
    key: str = "doc_id",
) -> DataFrame:
    """Reproducible Bernoulli sample: keeps rows whose md5(key:seed) prefix
    falls under the fraction threshold. Same rows on ANY partitioning,
    cluster size, or engine — and a pure predicate, so Catalyst pushes it
    into the scan."""
    return docs.where(_key_hex(key, seed) < F.lit(_threshold_hex(fraction)))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    seed: int = 42,
    key: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (corpus mixing: e.g. keep 100% of
    one language, 10% of another). Strata absent from ``fractions`` get
    ``default_fraction``. Same stability guarantees as
    deterministic_sample; still a single pushdown-friendly predicate."""
    thr = F.lit(_threshold_hex(default_fraction))
    for val, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(val), F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return docs.where(_key_hex(key, seed) < thr)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 64,
    exact_verify: bool = True,
) -> DataFrame:
    """Training docs with NO exact character n-gram (length ``n``) shared
    with any benchmark document: (doc_id, contaminated=false rows only is
    the common use; this returns (doc_id, contaminated) for auditability —
    filter ``~contaminated`` to get the clean corpus).

    Plan: both sides run the substring.py rolling-fingerprint kernel with
    select_mod=1 (EVERY n-byte window, one zero-shuffle mapInArrow scan per
    side), so the corpus-side join stream carries 8-byte hashes instead of
    n-byte substrings — at n=64 that is an 8x thinner stream than shipping
    the shingle strings, and the benchmark side's broadcast set shrinks the
    same way. Semantics stay EXACT: a shared n-CHAR shingle occupies >= n
    bytes, so its byte image contains at least one aligned n-byte window
    shared verbatim by both docs — every truly contaminated doc fingerprints
    into the candidate set (no false negatives; select_mod=1 samples
    nothing away). Candidates then re-check against the benchmark with the
    exact char-shingle semi-join, but only for the candidate sliver (a
    byte-window hit can cross char boundaries a char shingle would not, and
    a 2^-64 fp collision is possible — verification removes both), so the
    output is bit-identical to the plain shingle-join definition and the
    SQL oracle. ``exact_verify=False`` skips the recheck (w.h.p.-correct,
    one less pass) — the gate keeps it on.

    One corpus scan for candidates plus one scan of the candidate docs for
    verification; the eval side is eval-suite-sized, never corpus-sized."""
    from landscape_spark.text.dedup import shingles
    from landscape_spark.text.substring import substring_fingerprints

    bench_fp = (
        substring_fingerprints(benchmark, window=n, select_mod=1)
        .select("fp")
        .distinct()
    )
    cand = (
        substring_fingerprints(docs, window=n, select_mod=1)
        .join(bench_fp, on="fp", how="left_semi")
        .select("doc_id")
        .distinct()
    )
    if exact_verify:
        bench_sh = shingles(benchmark, n=n).select("sh").distinct()
        hits = (
            shingles(docs.join(cand, on="doc_id", how="left_semi"), n=n)
            .join(bench_sh, on="sh", how="left_semi")
            .select("doc_id")
            .distinct()
            .withColumn("contaminated", F.lit(True))
        )
    else:
        hits = cand.withColumn("contaminated", F.lit(True))
    return (
        docs.select("doc_id")
        .join(hits, on="doc_id", how="left")
        .select(
            "doc_id", F.coalesce("contaminated", F.lit(False)).alias("contaminated")
        )
    )


def deterministic_sample_sql(
    fraction: float, seed: int = 42, key: str = "doc_id"
) -> str:
    thr = _threshold_hex(fraction)
    return f"""
SELECT doc_id
FROM documents
WHERE substr(md5(CAST({key} AS VARCHAR) || ':{seed}'), 1, {_HEX_DIGITS}) < '{thr}'
"""


def stratified_sample_sql(
    fractions: dict[str, float],
    strata_col: str = "lang",
    seed: int = 42,
    key: str = "doc_id",
    default_fraction: float = 0.0,
) -> str:
    cases = " ".join(
        f"WHEN {strata_col} = '{val}' THEN '{_threshold_hex(frac)}'"
        for val, frac in sorted(fractions.items(), reverse=True)
    )
    return f"""
SELECT doc_id
FROM documents
WHERE substr(md5(CAST({key} AS VARCHAR) || ':{seed}'), 1, {_HEX_DIGITS})
      < (CASE {cases} ELSE '{_threshold_hex(default_fraction)}' END)
"""


def decontaminate_sql(n: int = 64, bench_pred: str = "doc_id % 20 = 0") -> str:
    """Oracle for decontaminate() with the benchmark side defined by a
    predicate over the same documents table (the gate's self-contained
    setup). Uses the same shingle definition as the n-gram oracles."""
    return f"""
WITH bsh AS MATERIALIZED (
  SELECT DISTINCT substr(text, CAST(i AS INT), {n}) AS sh
  FROM (SELECT text,
               UNNEST(range(1, GREATEST(length(text) - {n - 1}, 0) + 1)) AS i
        FROM documents WHERE {bench_pred})
),
dsh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {n}) AS sh
  FROM (SELECT doc_id, text,
               UNNEST(range(1, GREATEST(length(text) - {n - 1}, 0) + 1)) AS i
        FROM documents)
),
hits AS (SELECT DISTINCT doc_id FROM dsh JOIN bsh USING (sh))
SELECT d.doc_id AS doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
"""
