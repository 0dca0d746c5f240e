from landscape_spark.graph.cc import connected_components_exact
from landscape_spark.graph.pagerank import pagerank
from landscape_spark.graph.lpa import label_propagation
from landscape_spark.graph.triangles import triangle_count, triangles_per_vertex

__all__ = [
    "connected_components_exact",
    "pagerank",
    "label_propagation",
    "triangle_count",
    "triangles_per_vertex",
]
