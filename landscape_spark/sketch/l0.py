"""AGM l0-sampling linear sketches over edge-incidence vectors (numpy kernel).

The reference's supernode is a per-vertex stack of l0-sampling sketches of the
vertex's incidence characteristic vector, updated via XOR-style bucket writes
and merged LINEARLY (sketch(A) + sketch(B) = sketch(A xor B)), so partial
sketches computed anywhere merge into the same result
(/root/reference/src/worker_cluster.cpp:107-118 apply_delta_update;
/root/reference/src/graph_distrib_update.cpp:182 per-edge update;
CameoSketch/CubeSketch naming /root/reference/plotting/latex/defines.tex:90-94).
This module is our from-scratch, vectorized-numpy rendition of that public
construction (Ahn–Guha–McGregor SODA'12; GraphZeppelin SIGMOD'22):

* A supernode = ``rounds`` independent sketch GROUPS (one consumed per
  Boruvka round, preserving independence), each group = ``cols`` columns,
  each column = ``depths`` geometric levels.
* Updating with edge code e: for every (group, column), hash h = splitmix64(
  e ^ seed(g,c)); level = trailing_zeros(h) capped; XOR e into the level's
  value slot and checksum(e) into its check slot. Plus one deterministic
  bucket XOR-ing every update (catches the exactly-one-nonzero case).
* A bucket is GOOD iff value != 0 and check == checksum(value) — then value
  is (w.h.p.) the code of exactly one surviving edge: an l0 sample.
* Edges cancel: an edge appears in both endpoint supernodes with the SAME
  code, so merging the supernodes of a component cancels internal edges and
  leaves a sampler over the component's CUT — the Boruvka invariant.

Layout per vertex: uint64[n_slots] where n_slots = rounds*cols*depths*2 + 2
(the +2 is the deterministic bucket's value/check pair, stored first).
Everything below is pure numpy on uint64 and runs identically on every
executor given the same global seed (the reference broadcasts its seed at
INIT for the same reason, /root/reference/src/worker_cluster.cpp:39-47).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from landscape_spark.hashing import checksum, derive_seed, splitmix64, trailing_zeros

_OLD_ERR = np.seterr(over="ignore")  # uint64 wrap-around is intentional throughout


@dataclass(frozen=True)
class SketchParams:
    n: int  # number of vertices (dense 0..n-1); edge-code domain is n*n
    rounds: int  # independent groups (>= Boruvka rounds needed, ~log2 n + slack)
    cols: int  # columns per group (failure prob per group ~ const^cols)
    depths: int  # geometric levels per column (~log2(n) + slack)
    seed: int = 42
    # Level-assignment rule (the reference's USE_CUBE ablation,
    # /root/reference/CMakeLists.txt:57-61 — CameoSketch vs CubeSketch,
    # plotting/latex/defines.tex:90-94):
    #   "cameo": each update touches EXACTLY ONE level per column
    #            (level = trailing_zeros(hash)) — O(cols) bucket XORs per
    #            update per group; the production default.
    #   "cube":  classic AGM prefix subsampling — the update lands in every
    #            level 0..trailing_zeros(hash) (level d keeps a 2^-d
    #            subsample), ~2x the bucket XORs per update on average,
    #            denser shallow levels. Same GOOD-bucket test, same
    #            linearity; A/B'd in sketch/census.variant_ablation.
    variant: str = "cameo"
    # Level-hash derivation for (update, column):
    #   "splitmix": full splitmix64(code ^ seed(g,c)) per column — 9 ufunc
    #               passes; the conservative default.
    #   "fast":     splitmix64(code) ONCE per update, then per column a
    #               half-cost propagate-multiply-propagate finalizer of
    #               (h0 ^ seed(g,c)) — 5 passes. Census-validated
    #               (sketch/census.py fast-mix ablation) before use; the
    #               sampling failure analysis only needs per-column
    #               geometric levels with negligible cross-column
    #               correlation, both measured.
    level_mix: str = "splitmix"

    @staticmethod
    def for_graph(n: int, seed: int = 42, cols: int = 3, extra_rounds: int = 6) -> "SketchParams":
        """log2(n) Boruvka rounds + retry slack. Per-update work is
        rounds*cols bucket XORs — the same O(log n * log 1/delta) the
        reference's supernode update pays [GZ].

        cols=3 is the measured default (sketch/census.py ablation_sweep at
        n=1024/4096 x 3 shapes x seeds): per-(component, round) sampling
        failure ~2.2% with worst-case convergence in <= log2(n) rounds —
        comfortably inside the extra_rounds=6 retry slack — at 25% less
        kernel work and sketch space than cols=4 (failure 0.7%) and far
        safer than cols=2 (failure 7%)."""
        lg = max(1, int(np.ceil(np.log2(max(n, 2)))))
        return SketchParams(n=n, rounds=lg + extra_rounds, cols=cols, depths=lg + 4, seed=seed)

    @property
    def slots_per_group(self) -> int:
        return self.cols * self.depths * 2

    @property
    def n_slots(self) -> int:
        return self.rounds * self.slots_per_group + 2

    @property
    def nbytes(self) -> int:
        return self.n_slots * 8

    def col_seeds(self) -> np.ndarray:
        """uint64[rounds*cols] — seed for (group g, column c) at index g*cols+c."""
        out = np.empty(self.rounds * self.cols, dtype=np.uint64)
        for g in range(self.rounds):
            for c in range(self.cols):
                out[g * self.cols + c] = derive_seed(self.seed, g, c)
        return out


def edge_code(u: np.ndarray, v: np.ndarray, n: int) -> np.ndarray:
    """Canonical nonzero uint64 code for undirected edge {u,v}: lo*n + hi + 1.
    (The reference concatenates two 32-bit ids — concat_pairing_fn,
    /root/reference/src/graph_distrib_update.cpp:182; we use lo*n+hi+1 which
    extends past 2^32 vertices as long as n^2 < 2^64.)"""
    u = np.asarray(u, dtype=np.uint64)
    v = np.asarray(v, dtype=np.uint64)
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    return lo * np.uint64(n) + hi + np.uint64(1)


def decode_edge(code: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(code, dtype=np.uint64) - np.uint64(1)
    return (c // np.uint64(n)).astype(np.int64), (c % np.uint64(n)).astype(np.int64)


def empty_sketches(n_groups_rows: int, params: SketchParams) -> np.ndarray:
    return np.zeros((n_groups_rows, params.n_slots), dtype=np.uint64)


def build_sketches(
    vids: np.ndarray, codes: np.ndarray, params: SketchParams, chunk: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bulk build: XOR a stream of (vid, edge_code) updates into
    per-vid supernodes. Returns (unique_vids int64[G], sketches uint64[G, n_slots]).

    This is the engine's ingest hot path (the analog of the reference's
    generate_delta_node, /root/reference/src/distributed_worker.cpp:73-74):
    per chunk it computes all (row x group x column) bucket positions in one
    ufunc pipeline and scatter-XORs with np.bitwise_xor.at (numpy's indexed
    ufunc fast path — measured ~100M bucket-XORs/s/core, ~40x faster than a
    sort+reduceat fold). No Python-level per-row work anywhere.
    """
    vids = np.asarray(vids, dtype=np.int64)
    codes = np.asarray(codes, dtype=np.uint64)
    # process in vid order: scatter writes become row-local (cache-friendly)
    order = np.argsort(vids, kind="stable")
    vids = vids[order]
    codes = codes[order]
    uvids, li = np.unique(vids, return_inverse=True)
    G = len(uvids)
    if chunk is None:
        # cache-aware chunk sizing: every (chunk, rc) pass re-touches the
        # sketch rows of the chunk's distinct vids, RC times over. With
        # updates SORTED by vid, distinct vids per chunk ~ chunk / density
        # (density = updates per vid), so cap the per-pass row working set
        # at ~4MB: at n=2^14 (17KB rows, dense vids) this reproduces the
        # old 64k chunk, while at n=2^17 (23KB rows, sparse vids) the old
        # fixed chunk swept a ~24MB row set through DRAM on every one of
        # the ~60 passes — measured 1.5x slower per process and far worse
        # under 32 concurrent workers.
        density = max(1.0, len(codes) / max(1, G))
        target_rows = max(64, (4 << 20) // params.nbytes)
        chunk = int(min(65536, max(4096, density * target_rows)))
    out = empty_sketches(G, params)
    o = out.reshape(-1)
    seeds = params.col_seeds()  # (RC,)
    RC = len(seeds)
    D = params.depths
    row_len = params.n_slots

    # Loop (chunk x rc) with PREALLOCATED E-sized buffers and in-place ufuncs:
    # an (E, RC) hash matrix would stream ~10x the data through DRAM, and
    # fresh 512KB temporaries per column would mmap/munmap on every call —
    # both collapse under 32 concurrent executors. This loop allocates
    # nothing inside the hot path.
    from landscape_spark.hashing import (
        fastmix_inplace,
        splitmix64_inplace,
        trailing_zeros_inplace,
    )

    fast = params.level_mix == "fast"
    E0 = min(chunk, len(codes))
    h = np.empty(E0, dtype=np.uint64)
    tmp = np.empty(E0, dtype=np.uint64)
    f64 = np.empty(E0, dtype=np.float64)
    d = np.empty(E0, dtype=np.int64)
    flat = np.empty(E0, dtype=np.int64)
    for start in range(0, len(codes), chunk):
        cs = codes[start : start + chunk]
        ls = li[start : start + chunk]
        E = len(cs)
        if E == 0:
            continue
        hE, tmpE, f64E, dE, flatE = h[:E], tmp[:E], f64[:E], d[:E], flat[:E]
        chks = checksum(cs)
        h0 = splitmix64(cs) if fast else None  # one full mix per update
        det_flat = ls * row_len  # deterministic bucket once per update
        np.bitwise_xor.at(o, det_flat, cs)
        np.bitwise_xor.at(o, det_flat + 1, chks)
        val_base = det_flat + 2
        for rc in range(RC):
            if fast:
                np.bitwise_xor(h0, seeds[rc], out=hE)
                fastmix_inplace(hE, tmpE)
            else:
                np.bitwise_xor(cs, seeds[rc], out=hE)
                splitmix64_inplace(hE, tmpE)
            trailing_zeros_inplace(hE, D - 1, f64E, dE, tmpE)
            if params.variant == "cube":
                # prefix subsampling: XOR into EVERY level 0..tz (level d is
                # a 2^-d subsample). Level populations halve per step, so
                # total scatter work is ~2x the cameo rule's.
                for lvl in range(D):
                    sel = dE >= lvl
                    if not sel.any():
                        break
                    idx = val_base[sel] + (rc * D + lvl) * 2
                    np.bitwise_xor.at(o, idx, cs[sel])
                    np.bitwise_xor.at(o, idx + 1, chks[sel])
                continue
            # cameo rule: exactly one level per (update, column)
            # flat = val_base + (rc*D + d) * 2
            np.add(dE, rc * D, out=flatE)
            np.multiply(flatE, 2, out=flatE)
            np.add(flatE, val_base, out=flatE)
            np.bitwise_xor.at(o, flatE, cs)
            flatE += 1
            np.bitwise_xor.at(o, flatE, chks)
    return uvids, out


def merge_sketches(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Linear merge (the reference's apply_delta_update,
    /root/reference/src/worker_cluster.cpp:107-118): plain XOR."""
    return a ^ b


def xor_fold_rows(sketches: np.ndarray, group_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """XOR-fold sketch rows by group id. Returns (unique_ids, folded)."""
    order = np.argsort(group_ids, kind="stable")
    gs = group_ids[order]
    ss = sketches[order]
    starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
    folded = np.bitwise_xor.reduceat(ss, starts, axis=0)
    return gs[starts], folded


def sample_group(
    sketches: np.ndarray, group: int, params: SketchParams
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Draw one l0 sample per sketch row from group ``group`` (one-shot per
    Boruvka round — the analog of Supernode::sample consuming query state).

    Returns (ok bool[G], u int64[G], v int64[G]). Checks the deterministic
    bucket first, then columns in order, deepest level first (deep levels are
    the sparse ones, likeliest to hold exactly one item).
    """
    G = sketches.shape[0]
    found = np.zeros(G, dtype=bool)
    code = np.zeros(G, dtype=np.uint64)

    det_val = sketches[:, 0]
    det_chk = sketches[:, 1]
    good = (~found) & (det_val != 0) & (det_chk == checksum(det_val))
    code[good] = det_val[good]
    found |= good

    base = 2 + group * params.slots_per_group
    D = params.depths
    for c in range(params.cols):
        for d in range(D - 1, -1, -1):
            if found.all():
                break
            off = base + (c * D + d) * 2
            val = sketches[:, off]
            chk = sketches[:, off + 1]
            good = (~found) & (val != 0) & (chk == checksum(val))
            code[good] = val[good]
            found |= good

    u = np.zeros(G, dtype=np.int64)
    v = np.zeros(G, dtype=np.int64)
    if found.any():
        uu, vv = decode_edge(code[found], params.n)
        u[found] = uu
        v[found] = vv
    return found, u, v


def to_bytes(rows: np.ndarray) -> list[bytes]:
    return [r.tobytes() for r in rows]


def from_bytes(blobs, params: SketchParams) -> np.ndarray:
    return np.frombuffer(b"".join(blobs), dtype=np.uint64).reshape(-1, params.n_slots).copy()
