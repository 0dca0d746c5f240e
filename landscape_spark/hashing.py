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
