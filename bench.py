"""Benchmark harness — reproduces the reference's stream-ingest benchmark shape
(/root/reference/experiment/cluster_speed_expr.cpp: ingest rate in stream
updates/sec + CC query latency split flush/algorithm) plus the north-rule
additions (PageRank iteration wall-time, LPA, triangles, dedup, ANN).

Prints ONE JSON line to stdout; all logs go to stderr.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] cores (default 32)
  BENCH_INGEST_N      ingest-bench vertex count, power of 2 (default 16384)
  BENCH_INGEST_M      ingest-bench update count (default 1048576)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ingest_n = int(os.environ.get("BENCH_INGEST_N", str(1 << 14)))
    ingest_m = int(os.environ.get("BENCH_INGEST_M", str(1 << 22)))

    from pyspark.sql import functions as F

    from landscape_spark import linkgraph
    from landscape_spark.session import get_spark
    from landscape_spark.sketch.boruvka import _cc_rounds
    from landscape_spark.sketch.build import build_group_slices
    from landscape_spark.sketch.l0 import SketchParams

    spark = get_spark(
        app_name="landscape_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
    )
    from landscape_spark.metrics import HeartbeatReporter

    hb = HeartbeatReporter(spark, "/tmp/landscape_heartbeat.jsonl", interval=0.5).start()
    queries: dict[str, float] = {}

    # ------------------------------------------------------------------
    # 1. HEADLINE: sketch-CC stream ingest (updates/sec, reference metric)
    # ------------------------------------------------------------------
    log(f"[ingest] n={ingest_n} m={ingest_m} cores={cpus}")
    stream = linkgraph.synth_edge_stream(spark, ingest_n, ingest_m, seed=42).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    m_updates = stream.count()  # materialize generator cost outside the timer
    params = SketchParams.for_graph(ingest_n, seed=42)
    # best-of-3 (min-time): first build pays Python-worker cold start and the
    # host has bursty CPU steal; unpersist BEFORE rebuilding or Spark's
    # plan-keyed cache turns later reps into cache hits
    ingest_sec, slices, n_sk = float("inf"), None, 0
    for rep in range(3):
        if slices is not None:
            slices.unpersist(blocking=True)
        t0 = time.time()
        slices = build_group_slices(
            stream, params, num_partitions=max(8, cpus)
        ).persist()
        n_sk = slices.count()
        ingest_sec = min(ingest_sec, time.time() - t0)
    rate = m_updates / ingest_sec
    queries["ingest_sketch_build"] = round(ingest_sec, 3)
    log(f"[ingest] {m_updates} updates -> {n_sk} supernodes in {ingest_sec:.2f}s = {rate/1e6:.3f}M upd/s")

    # CC query latency on the ingested sketches (algorithm phase only —
    # flush phase is the build above, mirroring the reference's split)
    rounds_used = [0]
    comp_box = [0]

    def run_cc_query():
        vmap0 = slices.select(F.col("vid").alias("v"), F.col("vid").alias("comp"))
        vmap = _cc_rounds(
            spark, slices, vmap0.localCheckpoint(eager=True), params, 0, max(8, cpus),
            on_round=lambda g, s, m: rounds_used.__setitem__(0, g + 1),
        )
        comp_box[0] = vmap.select("comp").distinct().count()

    # best-of-2 (stateless over the immutable slices — each run consumes the
    # same groups from the same persisted table)
    cc_alg_sec = float("inf")
    for _ in range(2):
        t0 = time.time()
        run_cc_query()
        cc_alg_sec = min(cc_alg_sec, time.time() - t0)
    n_comp = comp_box[0]
    queries["cc_sketch_query"] = round(cc_alg_sec, 3)
    log(f"[cc_sketch] building R-MAT skew ingest row")
    # same ingest kernel over the Graph500 R-MAT stream — the hub-skew
    # stress the salting path exists for (vs SimpleStream's mild skew)
    # pre-materialized, like the reference's pre-built binary stream files
    # (cluster_speed_expr.cpp:46) — generation (14 xxhash64 levels/edge,
    # ~10s standalone) is not ingest cost
    rmat = linkgraph.rmat_stream(spark, 14, ingest_m, seed=42).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).where(F.col("a") != F.col("b")).localCheckpoint(eager=True)
    m_rmat = rmat.count()
    t_rmat, sl = float("inf"), None
    for _ in range(2):
        if sl is not None:
            sl.unpersist(blocking=True)
        t0 = time.time()
        sl = build_group_slices(rmat, params, num_partitions=max(8, cpus)).persist()
        sl.count()
        t_rmat = min(t_rmat, time.time() - t0)
    sl.unpersist(blocking=True)
    queries["ingest_rmat_sketch_build"] = round(t_rmat, 3)
    log(f"[ingest_rmat] {m_rmat} updates in {t_rmat:.2f}s = {m_rmat/t_rmat/1e6:.3f}M upd/s")
    log(f"[cc_sketch] {n_comp} components, {rounds_used[0]} rounds, {cc_alg_sec:.2f}s")

    # ------------------------------------------------------------------
    # 2. Link-graph analytics on the sf dir (derived documents graph)
    # ------------------------------------------------------------------
    n = linkgraph.num_vertices(spark, sf_dir)
    e_dir = linkgraph.directed_edges(spark, sf_dir).cache()
    e_und = linkgraph.undirected_edges(spark, sf_dir).cache()
    verts = linkgraph.vertices(spark, sf_dir)
    e_dir.count(), e_und.count()

    from landscape_spark.graph.cc import connected_components_exact
    from landscape_spark.graph.lpa import label_propagation
    from landscape_spark.graph.pagerank import pagerank
    from landscape_spark.graph.triangles import triangle_count

    def best_of(fn, reps):
        """Min-time over reps — the noise-robust capability statistic on
        this bursty-steal host (a single shot absorbs whole steal bursts;
        the round-2 'regression' was exactly one polluted single-shot)."""
        t = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            t = min(t, time.time() - t0)
        return round(t, 3)

    queries["cc_exact"] = best_of(
        lambda: connected_components_exact(e_und, verts).count(), 2
    )

    pr_iters = 10
    queries["pagerank_10iter"] = best_of(
        lambda: pagerank(e_dir, verts, n, iters=pr_iters).count(), 3
    )
    pr_iter_sec = queries["pagerank_10iter"] / pr_iters

    e_w = linkgraph.weighted_directed_edges(spark, sf_dir)
    queries["pagerank_weighted_10iter"] = best_of(
        lambda: pagerank(e_w, verts, n, iters=pr_iters, weight_col="w").count(), 2
    )

    # the CSR/treeAggregate SpMV variant (dense-vector regime fast path):
    # the one-time index build (shuffle + pack + broadcast) is reported
    # separately from pure iteration time — "PageRank iteration wall-time"
    # is the headline metric, and the reference likewise INITs workers with
    # static graph state once
    from landscape_spark.graph.csr import build_csr_index, pagerank_csr

    t0 = time.time()
    csr_index = build_csr_index(spark, e_dir, n, num_partitions=max(8, cpus))
    queries["pagerank_csr_index_build"] = round(time.time() - t0, 3)
    queries["pagerank_csr_10iter"] = best_of(
        lambda: pagerank_csr(
            spark, e_dir, n, iters=pr_iters, num_partitions=max(8, cpus),
            index=csr_index,
        ).count(),
        2,
    )
    csr_index[0].destroy()

    from landscape_spark.graph.csr import build_blocked_csr, pagerank_csr_blocked

    t0 = time.time()
    blk = build_blocked_csr(e_dir, n, shards=max(8, cpus), num_partitions=max(8, cpus))
    blk = (blk[0].persist(), blk[1].persist())
    blk[0].count(); blk[1].count()
    queries["pagerank_blocked_build"] = round(time.time() - t0, 3)
    queries["pagerank_blocked_10iter"] = best_of(
        lambda: pagerank_csr_blocked(
            spark, e_dir, n, iters=pr_iters, shards=max(8, cpus),
            num_partitions=max(8, cpus), blocks=blk,
        ).count(),
        2,
    )
    blk[0].unpersist(); blk[1].unpersist()

    queries["lpa_5iter"] = best_of(
        lambda: label_propagation(e_und, verts, iters=5).count(), 2
    )

    from landscape_spark.graph.hits import hits

    queries["hits_10iter"] = best_of(
        lambda: hits(e_dir, verts, n, iters=10).count(), 2
    )

    from landscape_spark.graph.salsa import salsa

    queries["salsa_10iter"] = best_of(
        lambda: salsa(e_dir, verts, iters=10).count(), 1
    )

    from landscape_spark.graph.kcore import coreness
    from landscape_spark.graph.linkpred import adamic_adar_topk
    from landscape_spark.graph.scc import strongly_connected_components
    from landscape_spark.graph.traversal import bfs_distances
    from landscape_spark.graph.triangles import clustering_coefficient

    queries["bfs_distances"] = best_of(
        lambda: bfs_distances(e_dir, seeds=list(range(8))).count(), 2
    )
    queries["coreness"] = best_of(lambda: coreness(e_und, verts).count(), 2)
    queries["scc"] = best_of(
        lambda: strongly_connected_components(e_dir, verts).count(), 2
    )
    queries["clustering_coefficient"] = best_of(
        lambda: clustering_coefficient(e_und, verts).count(), 2
    )
    queries["link_prediction_top20"] = best_of(
        lambda: adamic_adar_topk(e_und, k=20).count(), 2
    )

    from landscape_spark.graph.bowtie import bowtie_decomposition
    from landscape_spark.graph.stats import degree_assortativity, reciprocity

    queries["bowtie"] = best_of(
        lambda: bowtie_decomposition(e_dir, e_und, verts).count(), 2
    )
    queries["reciprocity"] = best_of(lambda: reciprocity(e_dir).count(), 2)

    from landscape_spark.graph.anf import neighborhood_function

    queries["anf_neighborhood"] = best_of(
        lambda: neighborhood_function(e_dir, verts).count(), 2
    )

    from landscape_spark.graph.anf import harmonic_centrality

    queries["harmonic_centrality"] = best_of(
        lambda: harmonic_centrality(e_dir, verts).count(), 2
    )

    from landscape_spark.graph.contract import contract_graph

    host_map = verts.select("v", (F.col("v") % 97).alias("unit"))
    queries["host_graph_contract"] = best_of(
        lambda: contract_graph(e_dir, host_map).count(), 2
    )
    queries["degree_assortativity"] = best_of(
        lambda: degree_assortativity(e_und).count(), 2
    )

    from landscape_spark.graph.betweenness import betweenness_sources

    queries["betweenness_8src"] = best_of(
        lambda: betweenness_sources(e_dir, verts, sources=list(range(8))).count(),
        1,
    )

    from landscape_spark.graph.katz import katz_centrality

    queries["katz_10iter"] = best_of(
        lambda: katz_centrality(e_dir, verts, iters=10).count(), 2
    )

    from landscape_spark.graph.linkpred import jaccard_topk
    from landscape_spark.graph.motifs import rectangle_count

    queries["rectangle_count"] = best_of(
        lambda: rectangle_count(e_und).count(), 2
    )
    queries["jaccard_top20"] = best_of(
        lambda: jaccard_topk(e_und, k=20).count(), 2
    )

    from landscape_spark.graph.linkpred import jaccard_lsh_topk

    queries["jaccard_lsh_top20"] = best_of(
        lambda: jaccard_lsh_topk(e_und, k=20).count(), 2
    )

    from landscape_spark.graph.truss import edge_support, k_truss

    queries["edge_support"] = best_of(lambda: edge_support(e_und).count(), 2)
    queries["ktruss_k4"] = best_of(lambda: k_truss(e_und, 4).count(), 2)

    from landscape_spark.graph.walks import random_walks

    queries["random_walks"] = best_of(
        lambda: random_walks(e_dir, verts, walk_len=6, walks_per_vertex=2).count(),
        2,
    )

    from landscape_spark.graph.walks import node2vec_walks

    queries["node2vec_walks"] = best_of(
        lambda: node2vec_walks(e_dir, verts, walk_len=6, p=4.0, q=0.25).count(),
        1,
    )

    tri_box = [0]
    queries["triangle_count"] = best_of(
        lambda: tri_box.__setitem__(0, triangle_count(e_und).first()[0]), 2
    )
    log(f"[triangles] {tri_box[0]}")

    # k-forest certificate run with peak-RSS sampling (the reference's
    # max-RSS metric for this experiment, cluster_k_connect_expr.cpp:124)
    from landscape_spark.metrics import PeakRssSampler
    from landscape_spark.sketch.boruvka import k_spanning_forests

    kf_box = [0]
    with PeakRssSampler(interval=0.2) as rss:
        queries["k_spanning_forests_k2"] = best_of(
            lambda: kf_box.__setitem__(
                0,
                k_spanning_forests(
                    spark, e_und, n, k=2, seed=42, num_partitions=max(8, cpus)
                ).count(),
            ),
            2,
        )
    kforest_max_rss_mib = round(rss.peak_mib, 1)
    log(f"[kforest] {kf_box[0]} forest edges, max_rss={kforest_max_rss_mib} MiB")

    # ------------------------------------------------------------------
    # 3. Training-data pipeline ops on documents/embeddings
    # ------------------------------------------------------------------
    from landscape_spark.sim import ann
    from landscape_spark.text import dedup

    def best_of_docs(opfn, reps):
        """Min-time over reps, each on a FRESHLY cached documents table
        after a full cache clear: these pipelines cache signature tables
        internally and Spark's plan-keyed cache would otherwise turn later
        reps into cache reads (persist is keyed by the canonicalized
        plan). Returns (best_sec, last docs DF) so later rows reuse the
        warm cache."""
        best, d = float("inf"), None
        for _ in range(reps):
            spark.catalog.clearCache()
            d = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
            d.count()
            t0 = time.time()
            opfn(d)
            best = min(best, time.time() - t0)
        return round(best, 3), d

    queries["dedup_minhash_lsh"], docs = best_of_docs(
        lambda d: dedup.minhash_lsh_dedup(d, threshold=0.8).count(), 3
    )

    # zero-shuffle SimHash pairs
    queries["simhash_pairs"], docs = best_of_docs(
        lambda d: dedup.simhash_near_pairs(d, max_hamming=8).count(), 2
    )

    # substring-level dedup (sampled rolling-hash window fingerprints)
    from landscape_spark.text.substring import substring_duplicate_pairs

    queries["dedup_substring"] = best_of(
        lambda: substring_duplicate_pairs(
            docs, window=64, select_mod=8, min_shared=2
        ).count(),
        2,
    )

    # pairs -> groups -> keeper composition (CC over the dup-pair graph);
    # pair generation is benched above, so time the composition itself
    pairs = dedup.minhash_lsh_dedup(docs, threshold=0.8).localCheckpoint(eager=True)
    queries["dedup_groups"] = best_of(
        lambda: dedup.near_dup_groups(docs, pairs).count(), 2
    )

    # train/eval decontamination: rolling-fingerprint candidates (8-byte
    # hashes through the join) + exact shingle verify on the candidate sliver
    from landscape_spark.text.corpus import decontaminate

    queries["decontaminate"] = best_of(
        lambda: decontaminate(docs, docs.where("doc_id % 20 = 0"), n=64).count(),
        2,
    )

    # per-doc top-k TF-IDF (one tokenize scan, df groupBy, WindowGroupLimit
    # rank window — the text-side kernel added in round 5)
    from landscape_spark.text.tfidf import tfidf_topk

    queries["tfidf_topk"] = best_of(
        lambda: tfidf_topk(docs, k=5).count(), 2
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    t0 = time.time()
    ann.brute_force_topk(emb, qvec, k=10).count()
    queries["ann_cosine_topk"] = round(time.time() - t0, 3)

    sf_label = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "sketch_cc_ingest_updates_per_sec",
        "value": round(rate, 1),
        "unit": "updates/sec",
        "queries": queries,
        "sf": float(sf_label) if sf_label.replace(".", "").isdigit() else sf_label,
        "ingest_updates": m_updates,
        "ingest_cores": cpus,
        "pagerank_iter_sec": round(pr_iter_sec, 3),
        "cc_query_sec": round(cc_alg_sec, 3),
        "kforest_max_rss_mib": kforest_max_rss_mib,
    }
    hb.stop()
    result["heartbeat_samples"] = sum(1 for _ in open("/tmp/landscape_heartbeat.jsonl"))
    spark.stop()

    # ------------------------------------------------------------------
    # 4. Comm-factor epilogue (reference parser.py:21-27): re-run ingest at
    # quarter scale in a fresh UI-enabled session (the REST status endpoint
    # costs ~20% on job-heavy queries, so the TIMED session runs UI-off).
    # Stream payload = 17 B/update (u8 type + 2 x u64 endpoints).
    # ------------------------------------------------------------------
    from landscape_spark.metrics import comm_factor, stage_totals

    spark2 = get_spark(
        app_name="landscape_bench_comm",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf={"spark.ui.enabled": "true"},
    )
    stream2 = linkgraph.synth_edge_stream(
        spark2, ingest_n, ingest_m // 4, seed=42
    ).select(F.col("src").alias("a"), F.col("dst").alias("b"))
    m2 = stream2.count()
    snap0 = stage_totals(spark2)
    build_group_slices(stream2, params, num_partitions=max(8, cpus)).write.mode(
        "overwrite"
    ).format("noop").save()
    cf = comm_factor(snap0, stage_totals(spark2), m2 * 17)
    result["ingest_comm_factor"] = round(cf, 4) if cf is not None else None
    log(f"[comm] factor={result['ingest_comm_factor']}")
    spark2.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
