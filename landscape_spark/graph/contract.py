"""Graph contraction: collapse vertices through a mapping, aggregate edges.

The page-graph → host-graph workflow (Broder et al. and every crawl
pipeline since): map each vertex to a coarser unit (host, domain, site,
community id from LPA/CC/SCC), merge parallel edges into one weighted
edge, drop intra-unit self-loops. The contracted graph is the input to
host-level PageRank/centrality — usually two to three orders of
magnitude smaller than the page graph, which is what makes iterating at
10^12-page scale routine.

Plan shape: two hash joins decorating src and dst with their unit ids
(the mapping side is vertex-sized — at web scale both sides shuffle on
the vertex key; if the mapping fits in memory Spark's AQE broadcasts it
automatically), then one aggregate on the contracted key pair. No
iteration, no driver state. Composes with everything downstream: the
output (src, dst, weight) feeds pagerank(weight_col="weight"),
reciprocity, degree_distribution, ... unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contract_graph(
    edges: DataFrame,
    mapping: DataFrame,
    keep_self_loops: bool = False,
) -> DataFrame:
    """Return (src, dst, weight): the multigraph image of directed
    (src, dst) edges under the vertex mapping (v, unit), with weight =
    number of original edges between the two units. Edges whose both
    endpoints map to the same unit are dropped unless keep_self_loops
    (host-internal navigation links vs cross-host links — the standard
    host-graph convention drops them). Vertices missing from the mapping
    raise via an inner join dropping their edges silently — pass a TOTAL
    mapping (the caller owns that invariant; a left join with a sentinel
    would silently merge unmapped vertices into one unit instead)."""
    msrc = mapping.select(F.col("v").alias("src"), F.col("unit").alias("_us"))
    mdst = mapping.select(F.col("v").alias("dst"), F.col("unit").alias("_ud"))
    out = (
        edges.join(msrc, on="src")
        .join(mdst, on="dst")
        .select(F.col("_us").alias("src"), F.col("_ud").alias("dst"))
    )
    if not keep_self_loops:
        out = out.where(F.col("src") != F.col("dst"))
    return out.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))
