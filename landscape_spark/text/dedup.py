"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Exact and n-gram-Jaccard are pure DataFrame plans with bit-matching DuckDB
oracles. MinHash-LSH and SimHash are the scale paths (candidate generation is
hash-bucketed, never all-pairs); their candidates are exact-verified, and the
tests check them against the all-pairs truth.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from landscape_spark.hashing import splitmix64

NGRAM = 3


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """(doc_id, keep_id): canonical representative (min doc_id) per identical
    text (md5 key). Scale: one shuffle on the 16-byte digest, never the text."""
    fp = docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("fp"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    return fp.join(keep, on="fp").select("doc_id", "keep_id")


def shingles(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """Distinct character n-gram shingles per doc: (doc_id, sh)."""
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length(text) - {n - 1}, 0)),"
                    f" i -> substring(text, i, {n}))"
                )
            ).alias("sh"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """All pairs (doc_lo, doc_hi, jac) with n-gram Jaccard >= threshold.
    Plan: shingle inverted index self-join (pairs meet only on shared
    shingles — the sparse analog of a similarity join), then |A|,|B| sizes
    joined in, J = inter / (|A|+|B|-inter). Exact; oracle-matched."""
    sh = shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_lo"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_hi"), "sh")
    inter = (
        a.join(b, on="sh")
        .where(F.col("doc_lo") < F.col("doc_hi"))
        .groupBy("doc_lo", "doc_hi")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_lo").withColumnRenamed("sz", "sz_lo"), on="doc_lo")
        .join(sizes.withColumnRenamed("doc_id", "doc_hi").withColumnRenamed("sz", "sz_hi"), on="doc_hi")
        .select(
            "doc_lo",
            "doc_hi",
            (F.col("inter") / (F.col("sz_lo") + F.col("sz_hi") - F.col("inter"))).alias("jac_raw"),
        )
        .where(F.col("jac_raw") >= threshold)
        .select("doc_lo", "doc_hi", F.round("jac_raw", 6).alias("jac"))
    )
    return out


NGRAM_JACCARD_SQL_TMPL = """
WITH sh AS (
  SELECT DISTINCT doc_id,
         substr(text, CAST(i AS INT), {n}) AS sh
  FROM (SELECT doc_id, text,
               UNNEST(range(1, GREATEST(length(text) - {nm1}, 0) + 1)) AS i
        FROM documents)
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_lo, doc_hi,
       ROUND(CAST(inter AS DOUBLE) / (sl.sz + sr.sz - inter), 6) AS jac
FROM inter
JOIN sizes sl ON sl.doc_id = doc_lo
JOIN sizes sr ON sr.doc_id = doc_hi
WHERE CAST(inter AS DOUBLE) / (sl.sz + sr.sz - inter) >= {threshold}
"""


def ngram_jaccard_sql(threshold: float = 0.5, n: int = NGRAM) -> str:
    return NGRAM_JACCARD_SQL_TMPL.format(n=n, nm1=n - 1, threshold=threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH (scale path for near-dup at 100TB: no all-pairs join)
# ---------------------------------------------------------------------------

def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, seed: int = 42, n: int = NGRAM
) -> DataFrame:
    """(doc_id, sig array<long>): MinHash over character n-gram shingles.
    Arrow-vectorized: shingle -> uint64 via seeded splitmix64 chain; per-doc
    min across shingles for each of num_hashes independent hash functions."""
    sh = shingles(docs, n)

    def sig(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        seeds = splitmix64(np.arange(num_hashes, dtype=np.uint64) + np.uint64(seed << 8))
        acc: dict[int, np.ndarray] = {}
        for b in batches:
            doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            shs = b.column("sh").to_pylist()
            base = np.array(
                [hash_bytes_u64(s.encode("utf-8")) for s in shs], dtype=np.uint64
            )
            hs = splitmix64(base[:, None] ^ seeds[None, :])  # (E, H)
            order = np.argsort(doc_ids, kind="stable")
            ds, hss = doc_ids[order], hs[order]
            starts = np.flatnonzero(np.r_[True, ds[1:] != ds[:-1]])
            mins = np.minimum.reduceat(hss, starts, axis=0)
            for d, m in zip(ds[starts], mins):
                prev = acc.get(int(d))
                acc[int(d)] = m if prev is None else np.minimum(prev, m)
        if not acc:
            return
        ids = sorted(acc)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(
                    [acc[i].astype(np.int64).tolist() for i in ids],
                    type=pa.list_(pa.int64()),
                ),
            ],
            names=["doc_id", "sig"],
        )

    part = sh.repartition(F.col("doc_id"))
    return part.mapInArrow(sig, "doc_id long, sig array<long>")


def hash_bytes_u64(b: bytes) -> np.uint64:
    """FNV-1a 64 over bytes, then splitmix64 finalize (deterministic across
    processes, unlike Python's salted hash())."""
    h = np.uint64(0xCBF29CE484222325)
    old = np.seterr(over="ignore")
    try:
        for byte in b:
            h = (h ^ np.uint64(byte)) * np.uint64(0x100000001B3)
        return splitmix64(h)
    finally:
        np.seterr(**old)


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 32, rows_per_band: int = 2
) -> DataFrame:
    """Band the signatures: docs sharing any band-hash become candidates.
    One shuffle on (band, band_hash) — never an all-pairs product."""
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b AS band, hash(slice(sig, b * {rows_per_band} + 1, {rows_per_band})) AS bh))"
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = banded.select(F.col("doc_id").alias("doc_lo"), "band", "bh")
    b = banded.select(F.col("doc_id").alias("doc_hi"), "band", "bh")
    return (
        a.join(b, on=["band", "bh"])
        .where(F.col("doc_lo") < F.col("doc_hi"))
        .select("doc_lo", "doc_hi")
        .distinct()
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH candidates, EXACT-verified with true
    n-gram Jaccard (so output ⊆ ngram_jaccard_pairs; recall measured in
    tests). Returns (doc_lo, doc_hi, jac). Default banding (b=32, r=2)
    targets threshold~0.5: detect P = 1-(1-J^2)^32 = 0.9998 at J=0.5."""
    sigs = minhash_signatures(docs, num_hashes=num_hashes, seed=seed)
    cands = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=num_hashes // bands)
    exact = ngram_jaccard_pairs(docs, threshold)
    return exact.join(cands, on=["doc_lo", "doc_hi"], how="left_semi")


# ---------------------------------------------------------------------------
# SimHash (64-bit) — near-dup by Hamming distance on token-hash majorities
# ---------------------------------------------------------------------------

def simhash(docs: DataFrame, seed: int = 42) -> DataFrame:
    """(doc_id, simhash long): sign-aggregated 64-bit token-hash sketch."""

    def sh(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            pdf = b.to_pandas()
            out_ids, out_hash = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.split()
                if not toks:
                    out_ids.append(int(doc_id))
                    out_hash.append(0)
                    continue
                hs = np.array([hash_bytes_u64(t.encode()) for t in toks], dtype=np.uint64)
                hs = splitmix64(hs ^ np.uint64(seed))
                bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
                votes = bits.astype(np.int64).sum(axis=0) * 2 - len(toks)
                word = np.uint64(0)
                for i in range(64):
                    if votes[i] > 0:
                        word |= np.uint64(1) << np.uint64(i)
                out_ids.append(int(doc_id))
                out_hash.append(int(word.view(np.int64) if hasattr(word, "view") else word))
            yield pa.RecordBatch.from_pandas(
                pd.DataFrame({"doc_id": out_ids, "simhash": np.array(out_hash, dtype=np.int64)}),
                preserve_index=False,
            )

    return docs.select("doc_id", "text").mapInArrow(sh, "doc_id long, simhash long")


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8, seed: int = 42) -> DataFrame:
    """Candidate near-dup pairs: block on 4 x 16-bit simhash chunks (two of
    four chunks must match exactly if hamming <= ~8 concentrated; standard
    multi-probe blocking), verify Hamming distance."""
    s = simhash(docs, seed).cache()
    chunks = s.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), c -> struct(c AS chunk,"
                " shiftright(simhash, c * 16) & 65535 AS ch))"
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", F.col("cc.chunk").alias("chunk"), F.col("cc.ch").alias("ch"))
    a = chunks.select(F.col("doc_id").alias("doc_lo"), F.col("simhash").alias("sh_lo"), "chunk", "ch")
    b = chunks.select(F.col("doc_id").alias("doc_hi"), F.col("simhash").alias("sh_hi"), "chunk", "ch")
    cand = (
        a.join(b, on=["chunk", "ch"])
        .where(F.col("doc_lo") < F.col("doc_hi"))
        .select("doc_lo", "doc_hi", "sh_lo", "sh_hi")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_lo").bitwiseXOR(F.col("sh_hi")))
    return cand.select("doc_lo", "doc_hi", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
