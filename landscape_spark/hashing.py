"""Seeded vectorized hashing used by the sketch kernels.

The reference broadcasts one seed at cluster INIT so that remote delta
generation agrees bit-for-bit with the main node's supernodes
(/root/reference/src/worker_cluster.cpp:39-47). We do the same: every executor
derives identical bucket positions from (GLOBAL_SEED, round, column) via
splitmix64, a public-domain mixer (Steele et al., "Fast Splittable
Pseudorandom Number Generators", OOPSLA'14).
"""

from __future__ import annotations

import numpy as np

GOLDEN = np.uint64(0x9E3779B97F4A7C15)
MIX1 = np.uint64(0xBF58476D1CE4E5B9)
MIX2 = np.uint64(0x94D049BB133111EB)
CHECK_MUL = np.uint64(0xFF51AFD7ED558CCB)
CHECK_SEED = np.uint64(0xC2B2AE3D27D4EB4F)

_ERR = np.geterr()


def splitmix64(x: np.ndarray | np.uint64) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (overflow wraps, as intended)."""
    old = np.seterr(over="ignore")
    try:
        z = np.asarray(x, dtype=np.uint64) + GOLDEN
        z = (z ^ (z >> np.uint64(30))) * MIX1
        z = (z ^ (z >> np.uint64(27))) * MIX2
        return z ^ (z >> np.uint64(31))
    finally:
        np.seterr(**old)


def derive_seed(global_seed: int, *parts: int) -> np.uint64:
    """Deterministic per-(round, column, ...) seed chain."""
    s = np.uint64(global_seed & 0xFFFFFFFFFFFFFFFF)
    for p in parts:
        s = splitmix64(s ^ np.uint64(p & 0xFFFFFFFFFFFFFFFF))
    return np.uint64(s)


def checksum(codes: np.ndarray) -> np.ndarray:
    """Per-item checksum so a bucket can prove it holds exactly one item:
    xor-of-checksums == checksum(xor-of-values) holds w.p. ~2^-64 unless the
    bucket holds exactly one item (or zero, excluded by value!=0)."""
    old = np.seterr(over="ignore")
    try:
        return splitmix64(np.asarray(codes, dtype=np.uint64) * CHECK_MUL ^ CHECK_SEED)
    finally:
        np.seterr(**old)


def splitmix64_inplace(z: np.ndarray, tmp: np.ndarray) -> None:
    """splitmix64 finalizer over uint64 IN PLACE (z modified; tmp same shape).
    Zero allocations — the sketch kernel calls this per (chunk, column) and
    512KB+ throwaway arrays would go through mmap on every call."""
    np.add(z, GOLDEN, out=z)
    np.right_shift(z, np.uint64(30), out=tmp)
    np.bitwise_xor(z, tmp, out=z)
    np.multiply(z, MIX1, out=z)
    np.right_shift(z, np.uint64(27), out=tmp)
    np.bitwise_xor(z, tmp, out=z)
    np.multiply(z, MIX2, out=z)
    np.right_shift(z, np.uint64(31), out=tmp)
    np.bitwise_xor(z, tmp, out=z)


def fastmix_inplace(z: np.ndarray, tmp: np.ndarray) -> None:
    """Half-cost finalizer over uint64 IN PLACE: shift-xor, multiply,
    shift-xor (5 ufunc passes vs splitmix64's 9). Designed for deriving
    per-column level hashes from an ALREADY-splitmix-finalized base
    (h0 ^ column_seed): the input is uniformly mixed, so one
    propagate-multiply-propagate round restores low-bit uniformity after
    the xor. Measured on structured edge codes: trailing-zero frequencies
    within binomial noise of geometric, cross-seed tz correlation < 1e-3;
    failure-rate parity with the full mix is re-validated in the census
    (sketch/census.py) before any default flip."""
    np.right_shift(z, np.uint64(30), out=tmp)
    np.bitwise_xor(z, tmp, out=z)
    np.multiply(z, MIX1, out=z)
    np.right_shift(z, np.uint64(27), out=tmp)
    np.bitwise_xor(z, tmp, out=z)


def trailing_zeros_inplace(
    x: np.ndarray, cap: int, f64: np.ndarray, out: np.ndarray, tmp: np.ndarray
) -> None:
    """count-trailing-zeros of uint64 into ``out`` (int64), zero allocations.
    f64: float64 buffer, tmp: uint64 buffer, all same shape as x."""
    np.negative(x, out=tmp)
    np.bitwise_and(x, tmp, out=tmp)  # lowest set bit
    np.copyto(f64, tmp, casting="unsafe")  # exact for powers of two
    fbits = f64.view(np.uint64)
    np.right_shift(fbits, np.uint64(52), out=fbits)
    np.copyto(out, fbits, casting="unsafe")
    np.subtract(out, 1023, out=out)
    out[tmp == 0] = cap
    np.minimum(out, cap, out=out)


# ---------------------------------------------------------------------------
# Vectorized XXH64 (Yann Collet's public-domain xxHash, 64-bit variant) —
# bit-compatible with Spark SQL's `xxhash64` expression so numpy kernels can
# fuse what would otherwise be a JVM hash + shuffle + regroup pipeline while
# producing IDENTICAL values. Layout of the algorithm follows the public
# xxHash spec; Spark reads words little-endian (x86 Platform.getLong).
# ---------------------------------------------------------------------------

XXP1 = np.uint64(0x9E3779B185EBCA87)
XXP2 = np.uint64(0xC2B2AE3D27D4EB4F)
XXP3 = np.uint64(0x165667B19E3779F9)
XXP4 = np.uint64(0x85EBCA77C2B2AE63)
XXP5 = np.uint64(0x27D4EB2F165667C5)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _xx_fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * XXP2
    h = h ^ (h >> np.uint64(29))
    h = h * XXP3
    return h ^ (h >> np.uint64(32))


def _gather_le_u64(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Little-endian uint64 at arbitrary (unaligned) byte offsets ``pos``."""
    out = np.zeros(len(pos), dtype=np.uint64)
    for i in range(8):
        out |= data[pos + i].astype(np.uint64) << np.uint64(8 * i)
    return out


def xxhash64_long(vals: np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64 of a single 8-byte long per element (Spark's XXH64.hashLong).
    ``seed`` may be an array — Spark folds multi-column hashes by feeding the
    running hash in as the next column's seed."""
    old = np.seterr(over="ignore")
    try:
        vals = np.asarray(vals, dtype=np.uint64)
        h = np.asarray(seed, dtype=np.uint64) + XXP5 + np.uint64(8)
        h = h ^ (_rotl64(vals * XXP2, 31) * XXP1)
        h = _rotl64(h, 27) * XXP1 + XXP4
        return _xx_fmix(h)
    finally:
        np.seterr(**old)


def xxhash64_int(vals: np.ndarray, seed: np.ndarray | np.uint64) -> np.ndarray:
    """XXH64 of a single 4-byte int per element (Spark's XXH64.hashInt —
    what `xxhash64(..., lit(intval))` folds for an IntegerType literal)."""
    old = np.seterr(over="ignore")
    try:
        v = np.asarray(vals, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
        h = np.asarray(seed, dtype=np.uint64) + XXP5 + np.uint64(4)
        h = h ^ (v * XXP1)
        h = _rotl64(h, 23) * XXP2 + XXP3
        return _xx_fmix(h)
    finally:
        np.seterr(**old)


def xxhash64_bytes(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray, seed: int
) -> np.ndarray:
    """Vectorized XXH64 over T variable-length byte slices of ``data``
    (uint8): slice t is data[starts[t] : starts[t] + lens[t]]. Matches
    Spark's XXH64.hashUnsafeBytes on every length class (>= 32 uses the
    4-accumulator stripes; tails are 8-byte rounds, one 4-byte round, then
    byte rounds). Masked iteration over shrinking active sets: the loop
    counts are max(stripes)/max(words)/3, not per-token Python work."""
    old = np.seterr(over="ignore")
    try:
        starts = np.asarray(starts, dtype=np.int64)
        lens = np.asarray(lens, dtype=np.int64)
        T = len(starts)
        h = np.empty(T, dtype=np.uint64)
        sd = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        long_idx = np.flatnonzero(lens >= 32)
        h[lens < 32] = sd + XXP5
        if len(long_idx):
            nstripes = lens[long_idx] // 32
            v1 = np.full(len(long_idx), sd + XXP1 + XXP2, dtype=np.uint64)
            v2 = np.full(len(long_idx), sd + XXP2, dtype=np.uint64)
            v3 = np.full(len(long_idx), sd, dtype=np.uint64)
            v4 = np.full(len(long_idx), sd - XXP1, dtype=np.uint64)
            off = starts[long_idx].copy()
            for s in range(int(nstripes.max())):
                act = np.flatnonzero(nstripes > s)
                pos = off[act]
                for lane, v in enumerate((v1, v2, v3, v4)):
                    k = _gather_le_u64(data, pos + 8 * lane)
                    v[act] = _rotl64(v[act] + k * XXP2, 31) * XXP1
                off[act] += 32
            hh = (
                _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
            )
            for v in (v1, v2, v3, v4):
                hh = (hh ^ (_rotl64(v * XXP2, 31) * XXP1)) * XXP1 + XXP4
            h[long_idx] = hh
        h = h + lens.astype(np.uint64)
        # full 8-byte words after the stripes
        nwords = (lens % 32) // 8
        if len(nwords) and nwords.max() > 0:
            woff = starts + (lens // 32) * 32
            pos = woff.copy()
            for w in range(int(nwords.max())):
                act = np.flatnonzero(nwords > w)
                k = _gather_le_u64(data, pos[act])
                h[act] = _rotl64(h[act] ^ (_rotl64(k * XXP2, 31) * XXP1), 27) * XXP1 + XXP4
                pos[act] += 8
        # one 4-byte round if >= 4 bytes remain
        m4 = np.flatnonzero((lens % 8) >= 4)
        if len(m4):
            p = starts[m4] + (lens[m4] // 8) * 8
            k32 = np.zeros(len(m4), dtype=np.uint64)
            for i in range(4):
                k32 |= data[p + i].astype(np.uint64) << np.uint64(8 * i)
            h[m4] = _rotl64(h[m4] ^ (k32 * XXP1), 23) * XXP2 + XXP3
        # trailing bytes (at most 3)
        nb = lens % 4
        bpos = starts + (lens - nb)
        for bi in range(int(nb.max()) if len(nb) else 0):
            act = np.flatnonzero(nb > bi)
            byte = data[bpos[act] + bi].astype(np.uint64)
            h[act] = _rotl64(h[act] ^ (byte * XXP5), 11) * XXP1
        return _xx_fmix(h)
    finally:
        np.seterr(**old)


def trailing_zeros(x: np.ndarray, cap: int) -> np.ndarray:
    """Vectorized count-trailing-zeros of uint64, capped at ``cap`` (geometric
    depth assignment for the l0-sampler levels).

    Fast path: isolate the lowest set bit (x & -x), convert to float64
    (exact for any power of two), and read the exponent field — one ufunc
    pipeline instead of a 6-pass shift loop. tz(0) maps to cap."""
    x = np.asarray(x, dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        lowbit = x & (np.uint64(0) - x)
    finally:
        np.seterr(**old)
    f = lowbit.astype(np.float64)
    tz = (f.view(np.uint64) >> np.uint64(52)).astype(np.int64) - 1023
    tz[lowbit == 0] = cap  # x == 0
    return np.minimum(tz, cap)
