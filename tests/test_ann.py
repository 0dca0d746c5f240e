"""Similarity search over embeddings: brute-force vs DuckDB oracle; LSH recall."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from landscape_spark.sim import ann


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


@pytest.fixture(scope="module")
def query_vec(sf_small):
    con = duckdb.connect()
    row = con.execute(
        f"SELECT embedding FROM '{sf_small}/embeddings.parquet' WHERE vec_id = 0"
    ).fetchone()
    return [float(x) for x in row[0]]


def test_brute_force_topk_matches_duckdb(emb, query_vec, sf_small):
    got = sorted(map(tuple, ann.brute_force_topk(emb, query_vec, k=10).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE embeddings AS SELECT * FROM '{sf_small}/embeddings.parquet'"
    )
    expected = sorted(con.execute(ann.brute_force_topk_sql(query_vec, k=10)).fetchall())
    assert got == expected
    # vec_id 0 itself must be rank-1 with sim 1.0
    by_sim = sorted(got, key=lambda r: -r[1])
    assert by_sim[0][0] == 0 and by_sim[0][1] == pytest.approx(1.0, abs=1e-6)


def test_lsh_topk_recall_planted(spark):
    """LSH recall is only meaningful when near neighbors exist: plant 10
    vectors at cosine ~0.97 to the query among 500 random ones. (The driver
    embeddings table is near-uniform — top-1 cosine ~0.33 — so it tests
    brute-force parity, not LSH structure.)"""
    rng = np.random.default_rng(0)
    dim = 64
    q = rng.normal(size=dim)
    q /= np.linalg.norm(q)
    rows = []
    for i in range(10):  # planted near-dups of q
        v = q + 0.03 * rng.normal(size=dim)  # ||noise|| ~ 0.24 -> cosine ~ 0.97
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    for i in range(10, 510):  # background noise
        v = rng.normal(size=dim)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    truth = [r.vec_id for r in ann.brute_force_topk(emb, q.tolist(), k=10).collect()]
    assert set(truth) == set(range(10))
    got = [r.vec_id for r in ann.lsh_topk(emb, q.tolist(), k=10, n_planes=8, n_tables=6).collect()]
    overlap = len(set(truth) & set(got)) / len(truth)
    assert overlap >= 0.8, f"LSH ANN recall too low: {overlap}"
    # prebuilt (cached) signature tables answer REPEATED queries without
    # rescanning the corpus and give the identical result
    sigs = ann.lsh_signature_tables(emb, n_planes=8, n_tables=6)
    got2 = [
        r.vec_id
        for r in ann.lsh_topk(
            emb, q.tolist(), k=10, n_planes=8, n_tables=6, sigs=sigs
        ).collect()
    ]
    assert got2 == got
    q2 = -q  # a second query against the SAME prebuilt tables
    assert (
        len(
            ann.lsh_topk(
                emb, q2.tolist(), k=10, n_planes=8, n_tables=6, sigs=sigs
            ).collect()
        )
        <= 10
    )
    for s in sigs:
        s.unpersist()


def test_hyperplane_signatures_deterministic(emb):
    a = {r.vec_id: r.bucket for r in ann.hyperplane_signatures(emb, 12, 64, seed=5).collect()}
    b = {r.vec_id: r.bucket for r in ann.hyperplane_signatures(emb, 12, 64, seed=5).collect()}
    assert a == b
    c = {r.vec_id: r.bucket for r in ann.hyperplane_signatures(emb, 12, 64, seed=6).collect()}
    assert a != c


def test_knn_exact_broadcast_matches_duckdb(emb, sf_small):
    from landscape_spark.sim.knn import knn_exact_broadcast, knn_label_majority_sql

    got = sorted(map(tuple, knn_exact_broadcast(emb, k=5).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE embeddings AS SELECT * FROM '{sf_small}/embeddings.parquet'"
    )
    expected = sorted(con.execute(knn_label_majority_sql(k=5)).fetchall())
    assert got == expected


def test_knn_exact_plan_has_no_cartesian(emb):
    from landscape_spark.sim.knn import knn_label_majority

    plan = knn_label_majority(emb, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_knn_lsh_agreement_with_exact(spark):
    """The 100TB LSH-candidate path on a clusterable corpus: label agreement
    with the exact path must be high (candidates contain the true near
    neighbors when real cluster structure exists)."""
    rng = np.random.default_rng(3)
    dim = 64
    rows = []
    centers = [rng.normal(size=dim) for _ in range(4)]
    for i in range(400):
        c = i % 4
        v = centers[c] + 0.15 * rng.normal(size=dim)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist(), c))
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label long")
    from landscape_spark.sim.knn import knn_exact_broadcast, knn_lsh

    exact = {r.vec_id: r.pred_label for r in knn_exact_broadcast(emb2, k=5).collect()}
    approx = {r.vec_id: r.pred_label for r in knn_lsh(emb2, k=5).collect()}
    agree = sum(exact[i] == approx[i] for i in exact) / len(exact)
    assert agree >= 0.9, f"LSH kNN agreement too low: {agree}"


def test_ivf_topk_recall_planted(spark):
    """IVF with a trained coarse quantizer on a clustered corpus: planted
    near-dups must be recovered through the probed cells."""
    rng = np.random.default_rng(11)
    dim = 64
    q = rng.normal(size=dim)
    q /= np.linalg.norm(q)
    rows = []
    for i in range(10):
        v = q + 0.03 * rng.normal(size=dim)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    for i in range(10, 510):
        v = rng.normal(size=dim)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    truth = [r.vec_id for r in ann.brute_force_topk(emb, q.tolist(), k=10).collect()]
    got = [
        r.vec_id
        for r in ann.ivf_topk(emb, q.tolist(), k=10, n_cells=8, nprobe=2).collect()
    ]
    overlap = len(set(truth) & set(got)) / len(truth)
    assert overlap >= 0.8, f"IVF recall too low: {overlap}"


def test_ivf_training_deterministic_and_scan_fraction(spark):
    rng = np.random.default_rng(12)
    rows = [
        (i, (lambda v: (v / np.linalg.norm(v)).astype(float).tolist())(rng.normal(size=64)))
        for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c1 = ann.ivf_train_centroids(emb, n_cells=8, iters=3)
    c2 = ann.ivf_train_centroids(emb, n_cells=8, iters=3)
    assert np.allclose(c1, c2)
    assigned = ann.ivf_assign(emb, c1)
    sizes = {r.cell: r.cnt for r in assigned.groupBy("cell").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")
    ).collect()}
    assert sum(sizes.values()) == 300
    # probing 2 of 8 cells scans a fraction, not the corpus
    top2 = sorted(sizes.values(), reverse=True)[:2]
    assert sum(top2) < 300


def test_embedding_near_dup_exact_matches_duckdb(emb, sf_small):
    from landscape_spark.sim import embdup

    got = sorted(
        map(tuple, embdup.embedding_near_dup_pairs(emb, threshold=0.35).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE embeddings AS SELECT * FROM '{sf_small}/embeddings.parquet'"
    )
    expected = sorted(
        con.execute(embdup.embedding_near_dup_sql(threshold=0.35)).fetchall()
    )
    assert len(got) == len(expected) and got == expected
    assert all(lo < hi for lo, hi, _ in got)


def test_embedding_near_dup_exact_plan_has_no_cartesian(emb):
    from landscape_spark.sim import embdup

    plan = embdup.embedding_near_dup_exact(emb, threshold=0.35)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_near_dup_lsh_recall_planted(spark):
    """The LSH scale path must recover (nearly) all PLANTED high-cosine pairs
    (the sf embeddings are near-uniform, so recall is only meaningful on a
    planted fixture — same rationale as test_lsh_topk_recall_planted)."""
    from landscape_spark.sim import embdup

    rng = np.random.default_rng(3)
    dim = 64
    rows = []
    for g in range(12):  # 12 planted pairs at cosine ~0.97
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        v = base + 0.03 * rng.normal(size=dim)
        rows.append((2 * g, base.astype(float).tolist()))
        rows.append((2 * g + 1, (v / np.linalg.norm(v)).astype(float).tolist()))
    for i in range(24, 424):
        v = rng.normal(size=dim)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    emb_df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    truth = {
        (r.id_lo, r.id_hi)
        for r in embdup.embedding_near_dup_exact(emb_df, threshold=0.9).collect()
    }
    assert truth >= {(2 * g, 2 * g + 1) for g in range(12)}
    got = {
        (r.id_lo, r.id_hi)
        for r in embdup.embedding_near_dup_lsh(emb_df, threshold=0.9).collect()
    }
    assert got <= truth  # exact rescore => precision 1.0
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"embedding LSH recall too low: {recall}"


def test_embedding_near_dup_ivf_recall_planted_low_cosine(spark):
    """The IVF-blocked path is the scale route for LOW-cosine thresholds
    (hyperplane LSH is unselective there — embedding_near_dup_lsh warns and
    points here). Planted pairs at cosine ~0.6 must be recovered through
    multi-probe cell blocking + exact rescore."""
    from landscape_spark.sim import embdup

    rng = np.random.default_rng(11)
    dim = 64
    rows = []
    for g in range(12):  # planted pairs at cosine ~0.6
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        noise = rng.normal(size=dim)
        noise -= (noise @ base) * base  # orthogonal component
        noise /= np.linalg.norm(noise)
        v = 0.6 * base + 0.8 * noise  # exact cosine 0.6 with base
        rows.append((2 * g, base.astype(float).tolist()))
        rows.append((2 * g + 1, (v / np.linalg.norm(v)).astype(float).tolist()))
    for i in range(24, 424):
        v = rng.normal(size=dim)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    emb_df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    truth = {
        (r.id_lo, r.id_hi)
        for r in embdup.embedding_near_dup_exact(emb_df, threshold=0.55).collect()
    }
    assert truth >= {(2 * g, 2 * g + 1) for g in range(12)}
    got = {
        (r.id_lo, r.id_hi)
        for r in embdup.embedding_near_dup_ivf(
            emb_df, threshold=0.55, n_cells=16, nprobe=4
        ).collect()
    }
    assert got <= truth  # exact rescore => precision 1.0
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"embedding IVF recall too low: {recall}"


def test_embedding_near_dup_lsh_low_threshold_warns(spark):
    """Auto-tuned LSH at a low-cosine threshold must WARN that it is in the
    unselective regime (and still run)."""
    import warnings

    from landscape_spark.sim import embdup

    rng = np.random.default_rng(5)
    rows = [
        (i, (lambda v: (v / np.linalg.norm(v)).astype(float).tolist())(rng.normal(size=64)))
        for i in range(60)
    ]
    emb_df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        embdup.embedding_near_dup_lsh(emb_df, threshold=0.35).count()
    assert any("unselective" in str(x.message) for x in w)


def test_multi_table_signatures_match_single_table(spark):
    """hyperplane_signatures_multi's table-t slice must be bit-identical to
    the single-table derivation with seed + t*1000 (prebuilt per-table
    signature caches stay interchangeable with the one-pass kernel)."""
    import numpy as np

    from landscape_spark.sim import ann

    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(size=16).tolist()) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    multi = {
        (r.vec_id, r.table): r.bucket
        for r in ann.hyperplane_signatures_multi(
            emb, n_planes=6, n_tables=3, dim=16, seed=42
        ).collect()
    }
    for t in range(3):
        single = {
            r.vec_id: r.bucket
            for r in ann.hyperplane_signatures(
                emb, n_planes=6, dim=16, seed=42 + t * 1000
            ).collect()
        }
        assert all(multi[(v, t)] == b for v, b in single.items())


def test_lsh_candidate_plan_scans_embeddings_once(spark, sf_small):
    """The one-pass candidate generator: all L tables' signatures come from
    a single corpus scan whose exchange is REUSED for the self-join's other
    side — never L scans + L joins. (AQE reuses shuffle stages at runtime
    via the same canonical-plan equality; asserted with AQE off where the
    reuse is visible statically.)"""
    from landscape_spark.sim import embdup

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = embdup.embedding_near_dup_lsh(
            emb, threshold=0.9, n_planes=10, n_tables=8
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert plan.count("ReusedExchange") >= 1, plan
    # 1 signature scan + 2 rescore-side scans; the old path had n_tables
    assert plan.count("Scan parquet") <= 3, plan
