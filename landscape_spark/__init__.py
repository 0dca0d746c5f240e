"""landscape_spark — a from-scratch PySpark-native link-graph analytics engine.

Capabilities mirror GraphStreamingProject/Landscape (ALENEX'25; reference at
/root/reference, cited by file:line in docstrings): connected components via
AGM/l0-sampling linear sketches merged through Boruvka supernode rounds,
k-edge-connectivity certificates, point connectivity queries — plus the
north-rule additions: PageRank, label propagation, triangle counting, and a
training-data pipeline layer (dedup, similarity search, text analysis) over
Common-Crawl-style page tables.

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst,
Arrow-vectorized pandas UDFs for the sketch kernels (never per-row Python),
one shuffle per sketch build, broadcast joins for small dimension maps, and
salted two-phase aggregation for hub-vertex skew.
"""

__version__ = "0.1.0"
