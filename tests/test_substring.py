"""Substring-level dedup: planted-substring properties of the rolling-hash
windowed fingerprint pass (document-level near-dup misses partial
containment; this operator exists to catch it)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from landscape_spark.text.substring import (
    substring_duplicate_pairs,
    substring_fingerprints,
)


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def test_planted_shared_substring_detected_exactly(spark):
    """select_mod=1 (every window emitted): any shared W-byte substring is
    detected with certainty; docs with no W-byte overlap produce no pair."""
    rng = random.Random(7)
    shared = _rand_text(rng, 120)  # >> window
    rows = [
        (0, _rand_text(rng, 300) + shared + _rand_text(rng, 200)),
        (1, shared + _rand_text(rng, 400)),  # partial containment, offset 0
        (2, _rand_text(rng, 500)),  # unrelated
        (3, _rand_text(rng, 30)),  # shorter than the window
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_lo, r.doc_hi): r.n_shared
        for r in substring_duplicate_pairs(
            docs, window=50, select_mod=1, min_shared=1
        ).collect()
    }
    assert (0, 1) in pairs
    # 120-byte shared run = 120 - 50 + 1 aligned windows, all shared
    assert pairs[(0, 1)] >= 120 - 50 + 1
    assert not any(2 in p or 3 in p for p in pairs)


def test_sampled_selection_is_content_keyed(spark):
    """With select_mod > 1 both docs sample the SAME windows of a shared
    substring (selection depends on content only), so a long-enough planted
    substring still matches; the fingerprint sets are position-independent."""
    rng = random.Random(13)
    shared = _rand_text(rng, 400)
    rows = [
        (0, _rand_text(rng, 250) + shared),
        (1, shared + _rand_text(rng, 250)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_lo, r.doc_hi)
        for r in substring_duplicate_pairs(
            docs, window=50, select_mod=8, min_shared=1
        ).collect()
    }
    assert (0, 1) in pairs


def test_rolling_hash_matches_direct_window_hash(spark):
    """The prefix-trick rolling hash must equal the directly-evaluated
    polynomial for every window (mod-2^64 arithmetic, any alignment)."""
    from landscape_spark.hashing import splitmix64
    from landscape_spark.text import substring as S

    rng = np.random.default_rng(3)
    text = bytes(rng.integers(32, 127, size=200, dtype=np.uint8))
    W = 17
    docs = spark.createDataFrame(
        [(0, text.decode("ascii"))], "doc_id long, text string"
    )
    got = {
        np.int64(r.fp).view(np.uint64).item()
        for r in substring_fingerprints(
            docs, window=W, select_mod=1, seed=42
        ).collect()
    }
    mix0 = splitmix64(np.uint64(42))
    want = set()
    with np.errstate(over="ignore"):
        for i in range(len(text) - W + 1):
            h = np.uint64(0)
            for c in text[i : i + W]:
                h = h * S._B + np.uint64(c)
            want.add(np.uint64(splitmix64(h ^ mix0)))
    assert got == want


def test_hot_fingerprint_cap_drops_boilerplate(spark):
    """A window shared by MORE than max_docs_per_fp docs is boilerplate and
    must not produce pairs (the quadratic per-bucket guard)."""
    rng = random.Random(21)
    boiler = _rand_text(rng, 80)
    # doc-unique suffix characters: no two docs share any window OUTSIDE the
    # boilerplate, including cross-boundary windows (a random-suffix version
    # of this test flagged a real pair whose suffixes began with the same
    # character — a genuine 50-byte shared substring, not a false positive)
    rows = [(i, boiler + chr(65 + i) * 100) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = substring_duplicate_pairs(
        docs, window=50, select_mod=1, min_shared=1, max_docs_per_fp=4
    ).collect()
    assert pairs == []  # every shared fp is held by all 10 docs > cap


def test_validation(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        substring_fingerprints(docs, window=1)
    with pytest.raises(ValueError):
        substring_fingerprints(docs, select_mod=0)
