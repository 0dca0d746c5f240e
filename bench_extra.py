"""Round-6 optimization harness — NOT the frozen driver bench (bench.py).

Per-query isolated timing with the noop sink (guide §1.4: every column of
every row computed, no sink cost, no count()-pruning) plus
``.explain("formatted")`` capture for the plan deliverables in plans/r06/.

Usage:
    python bench_extra.py [--tag after] [--plans-dir plans/r06] \
        [--reps 2] [--sf /root/testdata/sf0.1] [query ...]

Run it with PYTHONPATH pointing at an older checkout (and --tag before) to
capture the pre-optimization plans/timings of the same query set. Inputs and
query parameters mirror bench.py exactly so numbers are comparable; job
descriptions label every timed region (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="plan file suffix (before/after)")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from landscape_spark import linkgraph
    from landscape_spark.session import get_spark

    spark = get_spark(
        app_name="landscape_bench_extra",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(8, args.cpus),
    )
    sf_dir = args.sf
    n = linkgraph.num_vertices(spark, sf_dir)
    e_dir = linkgraph.directed_edges(spark, sf_dir).cache()
    e_und = linkgraph.undirected_edges(spark, sf_dir).cache()
    verts = linkgraph.vertices(spark, sf_dir)
    e_dir.count(), e_und.count()

    from landscape_spark.graph.anf import harmonic_centrality, neighborhood_function
    from landscape_spark.graph.betweenness import betweenness_sources
    from landscape_spark.graph.bowtie import bowtie_decomposition
    from landscape_spark.graph.cc import connected_components_exact
    from landscape_spark.graph.hits import hits
    from landscape_spark.graph.kcore import coreness
    from landscape_spark.graph.katz import katz_centrality
    from landscape_spark.graph.linkpred import (
        adamic_adar_topk,
        cocitation_topk,
        coupling_topk,
        jaccard_lsh_topk,
        jaccard_topk,
    )
    from landscape_spark.graph.lpa import label_propagation
    from landscape_spark.graph.pagerank import pagerank
    from landscape_spark.graph.salsa import salsa
    from landscape_spark.graph.scc import strongly_connected_components
    from landscape_spark.graph.traversal import bfs_distances
    from landscape_spark.graph.triangles import clustering_coefficient, triangle_count
    from landscape_spark.graph.truss import edge_support, k_truss
    from landscape_spark.graph.walks import node2vec_walks, random_walks

    builders = {
        "salsa_10iter": lambda: salsa(e_dir, verts, iters=10),
        "hits_10iter": lambda: hits(e_dir, verts, n, iters=10),
        "link_prediction_top20": lambda: adamic_adar_topk(e_und, k=20),
        "jaccard_top20": lambda: jaccard_topk(e_und, k=20),
        "jaccard_lsh_top20": lambda: jaccard_lsh_topk(e_und, k=20),
        "cocitation_top20": lambda: cocitation_topk(e_dir, k=20),
        "coupling_top20": lambda: coupling_topk(e_dir, k=20),
        "cc_exact": lambda: connected_components_exact(e_und, verts),
        "lpa_5iter": lambda: label_propagation(e_und, verts, iters=5),
        "coreness": lambda: coreness(e_und, verts),
        "anf_neighborhood": lambda: neighborhood_function(e_dir, verts),
        "harmonic_centrality": lambda: harmonic_centrality(e_dir, verts),
        "scc": lambda: strongly_connected_components(e_dir, verts),
        "bowtie": lambda: bowtie_decomposition(e_dir, e_und, verts),
        "bfs_distances": lambda: bfs_distances(e_dir, seeds=list(range(8))),
        "betweenness_8src": lambda: betweenness_sources(e_dir, verts, sources=list(range(8))),
        "katz_10iter": lambda: katz_centrality(e_dir, verts, iters=10),
        "pagerank_10iter": lambda: pagerank(e_dir, verts, n, iters=10),
        "clustering_coefficient": lambda: clustering_coefficient(e_und, verts),
        "triangle_count": lambda: triangle_count(e_und),
        "edge_support": lambda: edge_support(e_und),
        "ktruss_k4": lambda: k_truss(e_und, 4),
        "random_walks": lambda: random_walks(e_dir, verts, walk_len=6, walks_per_vertex=2),
        "node2vec_walks": lambda: node2vec_walks(e_dir, verts, walk_len=6, p=4.0, q=0.25),
    }

    def add_blocked():
        from landscape_spark.graph.csr import build_blocked_csr, pagerank_csr_blocked

        def run_build():
            blk = build_blocked_csr(e_dir, n, shards=args.cpus, num_partitions=args.cpus)
            b0, b1 = blk[0].persist(), blk[1].persist()
            b0.count(); b1.count()
            b0.unpersist(); b1.unpersist()

        def run_iter():
            blk = build_blocked_csr(e_dir, n, shards=args.cpus, num_partitions=args.cpus)
            blk = (blk[0].persist(), blk[1].persist())
            blk[0].count(); blk[1].count()
            t0 = time.time()
            pagerank_csr_blocked(
                spark, e_dir, n, iters=10, shards=args.cpus,
                num_partitions=args.cpus, blocks=blk,
            ).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            blk[0].unpersist(); blk[1].unpersist()
            return dt

        builders["pagerank_blocked_build"] = run_build
        builders["pagerank_blocked_10iter"] = run_iter

    add_blocked()

    def add_text():
        from landscape_spark.text import dedup

        docs_box = {}

        def docs():
            if "d" not in docs_box:
                d = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
                d.count()
                docs_box["d"] = d
            return docs_box["d"]

        builders["dedup_minhash_lsh"] = lambda: dedup.minhash_lsh_dedup(docs(), threshold=0.8)
        builders["simhash_pairs"] = lambda: dedup.simhash_near_pairs(docs(), max_hamming=8)

    add_text()

    names = args.queries or sorted(builders)
    results = {}
    for name in names:
        if name not in builders:
            log(f"[skip] unknown query {name}")
            continue
        fn = builders[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        best = float("inf")
        for rep in range(args.reps):
            t0 = time.time()
            out = fn()
            if out is None:          # self-timed builder returned elapsed
                best = min(best, time.time() - t0)
            elif isinstance(out, float):
                best = min(best, out)
            else:
                noop(out)
                best = min(best, time.time() - t0)
        results[name] = round(best, 3)
        log(f"[{name}] best-of-{args.reps}: {best:.3f}s")
        if args.plans_dir and args.tag:
            out = fn()
            if not isinstance(out, float) and out is not None:
                import contextlib
                import io

                os.makedirs(args.plans_dir, exist_ok=True)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    out.explain("formatted")
                with open(f"{args.plans_dir}/{name}_{args.tag}.txt", "w") as f:
                    f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
