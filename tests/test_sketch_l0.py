"""Unit tests of the l0-sketch kernel: sample validity, linearity/mergeability,
insert/delete cancellation — the properties the reference inherits from its
sketch library (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import numpy as np
import pytest

from landscape_spark.sketch import l0
from landscape_spark.sketch.l0 import SketchParams, build_sketches, edge_code


def _incidence_updates(edges, n):
    """(vids, codes): every edge feeds BOTH endpoint supernodes with the same
    canonical code (the 'two sketch updates per stream update',
    /root/reference/experiment/cluster_speed_expr.cpp:91-93)."""
    vids, codes = [], []
    for u, v in edges:
        c = int(edge_code(np.uint64(u), np.uint64(v), n)[()])
        vids += [u, v]
        codes += [c, c]
    return np.array(vids, dtype=np.int64), np.array(codes, dtype=np.uint64)


def test_single_edge_deterministic_bucket():
    p = SketchParams.for_graph(16, seed=1)
    vids, codes = _incidence_updates([(3, 7)], 16)
    uv, sk = build_sketches(vids, codes, p)
    assert list(uv) == [3, 7]
    for row in range(2):
        ok, u, v = l0.sample_group(sk[row : row + 1], 0, p)
        assert ok[0]
        assert (u[0], v[0]) == (3, 7)


def test_samples_are_true_edges():
    rng = np.random.default_rng(0)
    n = 256
    p = SketchParams.for_graph(n, seed=7)
    edges = {tuple(sorted(e)) for e in rng.integers(0, n, size=(400, 2)) if e[0] != e[1]}
    vids, codes = _incidence_updates(sorted(edges), n)
    uv, sk = build_sketches(vids, codes, p)
    n_ok = 0
    for g in range(p.rounds):
        ok, u, v = l0.sample_group(sk, g, p)
        for i in range(len(uv)):
            if ok[i]:
                n_ok += 1
                assert (min(u[i], v[i]), max(u[i], v[i])) in edges
                assert uv[i] in (u[i], v[i])  # sampled edge is incident
    # success rate should be high across groups x vertices
    total = p.rounds * len(uv)
    assert n_ok / total > 0.85


def test_linearity_merge_equals_union_build():
    n = 64
    p = SketchParams.for_graph(n, seed=3)
    e1 = [(1, 2), (3, 4), (10, 20)]
    e2 = [(5, 6), (7, 8)]
    v1, c1 = _incidence_updates(e1, n)
    v2, c2 = _incidence_updates(e2, n)
    uv_a, sk_a = build_sketches(np.r_[v1, v2], np.r_[c1, c2], p)
    # build separately and XOR-merge
    uv_1, sk_1 = build_sketches(v1, c1, p)
    uv_2, sk_2 = build_sketches(v2, c2, p)
    merged = {}
    for uv, sk in [(uv_1, sk_1), (uv_2, sk_2)]:
        for i, vid in enumerate(uv):
            merged[vid] = merged.get(vid, np.zeros(p.n_slots, dtype=np.uint64)) ^ sk[i]
    for i, vid in enumerate(uv_a):
        assert np.array_equal(merged[vid], sk_a[i])


def test_delete_cancels_insert():
    n = 64
    p = SketchParams.for_graph(n, seed=9)
    v1, c1 = _incidence_updates([(1, 2), (3, 4)], n)
    vd, cd = _incidence_updates([(3, 4)], n)  # delete = re-insert (XOR self-inverse)
    uv, sk = build_sketches(np.r_[v1, vd], np.r_[c1, cd], p)
    by_vid = {vid: sk[i] for i, vid in enumerate(uv)}
    assert not by_vid[3].any() and not by_vid[4].any()  # fully cancelled
    ok, u, v = l0.sample_group(np.stack([by_vid[1]]), 0, p)
    assert ok[0] and (u[0], v[0]) == (1, 2)


def test_component_merge_exposes_cut_edges():
    """Merging supernodes of {1,2} cancels internal edge (1,2) and samples
    the cut edge (2,3) — the Boruvka invariant."""
    n = 32
    p = SketchParams.for_graph(n, seed=5)
    vids, codes = _incidence_updates([(1, 2), (2, 3)], n)
    uv, sk = build_sketches(vids, codes, p)
    by_vid = {vid: sk[i] for i, vid in enumerate(uv)}
    comp = by_vid[1] ^ by_vid[2]
    ok, u, v = l0.sample_group(comp[None, :], 0, p)
    assert ok[0] and (min(u[0], v[0]), max(u[0], v[0])) == (2, 3)


def test_odd_duplicate_count_net_present():
    """500001 duplicate inserts of one edge => net present (odd XOR count) —
    ports the reference's degenerate-batch stress
    (/root/reference/test/distributed_graph_test.cpp:225-247)."""
    n = 1024
    p = SketchParams.for_graph(n, seed=11)
    reps = 501  # odd; kernel folds XORs identically for 501 or 500001
    edges = [(1, 2)] * reps + [(2, 3)] * reps
    vids, codes = _incidence_updates(edges, n)
    uv, sk = build_sketches(vids, codes, p)
    by_vid = {vid: sk[i] for i, vid in enumerate(uv)}
    ok, u, v = l0.sample_group(by_vid[1][None, :], 0, p)
    assert ok[0] and (u[0], v[0]) == (1, 2)
    even_edges = edges + [(1, 2)]  # make (1,2) even => cancelled
    vids2, codes2 = _incidence_updates(even_edges, n)
    uv2, sk2 = build_sketches(vids2, codes2, p)
    by2 = {vid: sk2[i] for i, vid in enumerate(uv2)}
    ok2, u2, v2 = l0.sample_group(by2[2][None, :], 0, p)
    assert ok2[0] and (min(u2[0], v2[0]), max(u2[0], v2[0])) == (2, 3)


def test_xor_fold_rows():
    p = SketchParams.for_graph(16, seed=1)
    rows = np.arange(4 * p.n_slots, dtype=np.uint64).reshape(4, p.n_slots)
    gids = np.array([1, 0, 1, 0])
    ids, folded = l0.xor_fold_rows(rows, gids)
    assert list(ids) == [0, 1]
    assert np.array_equal(folded[0], rows[1] ^ rows[3])
    assert np.array_equal(folded[1], rows[0] ^ rows[2])


def test_bytes_roundtrip():
    p = SketchParams.for_graph(32, seed=2)
    vids, codes = _incidence_updates([(0, 1), (2, 3)], 32)
    uv, sk = build_sketches(vids, codes, p)
    blobs = l0.to_bytes(sk)
    back = l0.from_bytes(blobs, p)
    assert np.array_equal(back, sk)
