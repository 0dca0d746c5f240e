"""Substring-level deduplication: long shared-window fingerprinting.

Document-level near-dup (MinHash / SimHash / embedding cosine) misses PARTIAL
containment — boilerplate headers, quoted replies, syndicated paragraphs
pasted into otherwise-distinct documents. The standard remedy (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022, which
removes exact substring matches of >= 50 tokens) is a windowed fingerprint
pass: hash every W-byte window, keep a content-keyed 1/select_mod sample of
the window hashes, and flag document pairs sharing any sampled fingerprint —
two docs sharing a sampled window share an exact W-byte substring (up to a
2^-64 hash collision).

Detection guarantee: a shared substring of length S >= W contains S - W + 1
aligned windows, and selection depends only on window CONTENT, so both docs
sample the same subset; the substring is missed only if none of its windows
is selected, p_miss = (1 - 1/select_mod)^(S - W + 1). Size select_mod to the
minimum substring length you must catch (select_mod <= (L_min - W + 1) / 3
gives p_miss < 5%); window-per-window emission (select_mod=1) makes
detection exact at W bytes.

Scale shape: ONE zero-shuffle mapInArrow scan emits ~bytes/select_mod
fingerprint rows (each doc's windows live entirely in its own batch, so
per-doc dedup happens in the kernel); one shuffle groups by fingerprint; a
hot-fingerprint cap drops ubiquitous boilerplate windows (a fingerprint
shared by thousands of docs is navigation chrome, not a dup signal — and
would otherwise produce a quadratic per-bucket pair blow-up).

The rolling hash is a degree-(W-1) polynomial over Z_2^64 evaluated with the
invertible-base prefix trick: Q[i] = sum_{j<i} b[j] * Binv^j accumulates via
one cumsum, and h(i) = B^{i+W-1} * (Q[i+W] - Q[i]) recovers every window's
hash with O(1) vector work per position — no per-window loop, no per-row
Python. Raw polynomial values are splitmix64-finalized before selection and
bucketing (low bits of mod-2^64 polynomial hashes are weak).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from landscape_spark.hashing import splitmix64

_B = np.uint64(0x100000001B3)  # FNV-1a 64 prime: odd => invertible mod 2^64
_BINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def substring_fingerprints(
    docs: DataFrame, window: int = 50, select_mod: int = 8, seed: int = 42
) -> DataFrame:
    """(doc_id, fp long): content-sampled rolling-hash fingerprints of every
    W-byte window (distinct per doc). One mapInArrow scan, zero shuffle —
    same adaptive local-parallelism rule as the MinHash/SimHash kernels."""
    if window < 2:
        raise ValueError("window must be >= 2 bytes")
    if select_mod < 1:
        raise ValueError("select_mod must be >= 1")
    from landscape_spark.session import local_parallelism

    src = docs.select("doc_id", "text")
    target = local_parallelism(docs.sparkSession)
    if src.rdd.getNumPartitions() < max(2, target // 2):
        src = src.repartition(target)
    W = int(window)
    mod = np.uint64(select_mod)
    mix0 = splitmix64(np.uint64(seed))

    def fps(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        old = np.seterr(over="ignore")
        try:
            for b in batches:
                if b.num_rows == 0:
                    continue
                ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
                ta = b.column("text")
                bufs = ta.buffers()
                off_dtype = np.int64 if pa.types.is_large_string(ta.type) else np.int32
                offs = np.frombuffer(bufs[1], dtype=off_dtype)[
                    ta.offset : ta.offset + len(ta) + 1
                ].astype(np.int64)
                lens = offs[1:] - offs[:-1]
                nw = np.maximum(lens - (W - 1), 0)
                keep = nw > 0
                if not keep.any():
                    continue
                data = np.frombuffer(bufs[2], dtype=np.uint8)
                start = int(offs[0])
                seg = data[start : int(offs[-1])].astype(np.uint64)
                m = len(seg)
                # prefix Q[i] = sum_{j<i} b[j] * Binv^j  (mod 2^64)
                binv_pow = np.empty(m, dtype=np.uint64)
                binv_pow[0] = 1
                if m > 1:
                    np.cumprod(np.full(m - 1, _BINV, dtype=np.uint64), out=binv_pow[1:])
                Q = np.zeros(m + 1, dtype=np.uint64)
                np.cumsum(seg * binv_pow, out=Q[1:])
                b_pow = np.empty(m, dtype=np.uint64)  # b_pow[t] = B^t
                b_pow[0] = 1
                if m > 1:
                    np.cumprod(np.full(m - 1, _B, dtype=np.uint64), out=b_pow[1:])
                # every in-batch window hash; doc-crossing windows dropped by
                # the per-doc gather below
                H_all = b_pow[W - 1 :] * (Q[W:] - Q[:-W])
                reps = nw[keep]
                base = np.repeat(offs[:-1][keep] - start, reps)
                csum = np.cumsum(reps)
                within = np.arange(int(csum[-1])) - np.repeat(csum - reps, reps)
                h = splitmix64(H_all[base + within] ^ mix0)
                wdoc = np.repeat(ids[keep], reps)
                sel = h % mod == 0
                h, wdoc = h[sel], wdoc[sel]
                if len(h) == 0:
                    continue
                # per-doc dedup inside the kernel: a doc is one row, so ALL
                # its windows are in this batch — no downstream distinct
                order = np.lexsort((h, wdoc))
                h, wdoc = h[order], wdoc[order]
                first = np.empty(len(h), dtype=bool)
                first[0] = True
                first[1:] = (h[1:] != h[:-1]) | (wdoc[1:] != wdoc[:-1])
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(wdoc[first], type=pa.int64()),
                        pa.array(h[first].view(np.int64), type=pa.int64()),
                    ],
                    names=["doc_id", "fp"],
                )
        finally:
            np.seterr(**old)

    return src.mapInArrow(fps, "doc_id long, fp long")


def substring_duplicate_pairs(
    docs: DataFrame,
    window: int = 50,
    select_mod: int = 8,
    min_shared: int = 1,
    max_docs_per_fp: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(doc_lo, doc_hi, n_shared): document pairs sharing >= min_shared
    sampled W-byte window fingerprints — i.e. pairs with exact shared
    substrings document-level near-dup misses (partial containment).

    Fingerprints held by more than max_docs_per_fp documents are dropped
    before pairing: they are corpus-ubiquitous boilerplate, carry no dup
    signal, and would blow the per-bucket self-join up quadratically (the
    cap is the standard move in substring-dedup pipelines; raise it only
    with a matching raise in cluster resources). One shuffle on fp."""
    fp = substring_fingerprints(docs, window=window, select_mod=select_mod, seed=seed)
    # the fingerprint relation is referenced four ways below (count, semi
    # join, both self-join sides); materialize it once so the scan +
    # rolling-hash kernel run exactly once regardless of exchange-reuse
    # luck (the table is ~bytes/select_mod rows of two longs — far smaller
    # than the corpus it replaces)
    fp = fp.localCheckpoint(eager=False)
    cnt = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    ok = cnt.where(F.col("n_docs") <= max_docs_per_fp).select("fp")
    fp = fp.join(ok, on="fp", how="left_semi")
    a = fp.select(F.col("doc_id").alias("doc_lo"), "fp")
    b = fp.select(F.col("doc_id").alias("doc_hi"), "fp")
    return (
        a.join(b, on="fp")
        .where(F.col("doc_lo") < F.col("doc_hi"))
        .groupBy("doc_lo", "doc_hi")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
