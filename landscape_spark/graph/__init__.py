from landscape_spark.graph.betweenness import betweenness_sources
from landscape_spark.graph.cc import connected_components_exact
from landscape_spark.graph.contract import contract_graph
from landscape_spark.graph.hits import hits
from landscape_spark.graph.katz import eigenvector_centrality, katz_centrality
from landscape_spark.graph.kcore import coreness, k_core
from landscape_spark.graph.linkpred import (
    adamic_adar_topk,
    cocitation_topk,
    coupling_topk,
    jaccard_lsh_topk,
    jaccard_topk,
)
from landscape_spark.graph.lpa import label_propagation, seeded_label_propagation
from landscape_spark.graph.motifs import rectangle_count
from landscape_spark.graph.pagerank import pagerank, personalized_pagerank
from landscape_spark.graph.salsa import salsa
from landscape_spark.graph.scc import strongly_connected_components
from landscape_spark.graph.stats import (
    avg_neighbor_degree,
    degree_assortativity,
    degree_percentiles,
    degree_powerlaw_alpha,
    modularity,
    reciprocity,
)
from landscape_spark.graph.traversal import bfs_distances, sssp_weighted
from landscape_spark.graph.triangles import (
    triangle_count,
    triangle_count_sampled,
    triangles_per_vertex,
)
from landscape_spark.graph.truss import edge_support, k_truss
from landscape_spark.graph.walks import (
    node2vec_walks,
    random_walks,
    skipgram_pairs,
)

__all__ = [
    "adamic_adar_topk",
    "avg_neighbor_degree",
    "betweenness_sources",
    "bfs_distances",
    "cocitation_topk",
    "connected_components_exact",
    "contract_graph",
    "coreness",
    "coupling_topk",
    "degree_assortativity",
    "degree_percentiles",
    "degree_powerlaw_alpha",
    "edge_support",
    "eigenvector_centrality",
    "hits",
    "jaccard_lsh_topk",
    "jaccard_topk",
    "k_core",
    "k_truss",
    "katz_centrality",
    "label_propagation",
    "modularity",
    "node2vec_walks",
    "pagerank",
    "personalized_pagerank",
    "random_walks",
    "reciprocity",
    "rectangle_count",
    "salsa",
    "seeded_label_propagation",
    "skipgram_pairs",
    "sssp_weighted",
    "strongly_connected_components",
    "triangle_count",
    "triangle_count_sampled",
    "triangles_per_vertex",
]
