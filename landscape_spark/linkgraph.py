"""Deterministic link-graph derivation over the ``documents`` table.

The reference ingests pre-built binary edge streams (its synthetic generator
is an O(1)-state hash of the update index with skewed sources,
/root/reference/experiment/simple_stream.h:77-91). We mirror that idea but
derive the edges from the driver's ``documents`` table with PURE INTEGER
ARITHMETIC (no engine-specific hash), so the exact same edge set is
computable in Spark and in the DuckDB oracle — every graph query gets an
ANSI-SQL oracle.

Graph law (doc ids are dense 0..n-1):
    for each doc i and j in 0..K-1:
        h   = ((i mod 2^31) * 2654435761 + j * 40503 + 2246822519) mod 2^31
        dst = h mod NHUBS       if h mod 16 < 3    (hub skew: ~19% of links
                                                    land on vertices 0..7 —
                                                    the web's power-law hubs)
              h mod n           otherwise
        keep (i, dst) if dst != i;  directed edges are DISTINCT pairs.

Undirected views canonicalize (least, greatest). All constants < 2^32 and the
pre-multiply reduction keeps every intermediate < 2^62, so 64-bit semantics
are identical across engines (and safe at 10^12-doc scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K_OUT = 8
MOD = 2_147_483_648  # 2^31
MUL_A = 2_654_435_761  # Knuth multiplicative constant
MUL_B = 40_503
ADD_C = 2_246_822_519
HUB_MOD = 16
HUB_CUT = 3
N_HUBS = 8


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def num_vertices(spark: SparkSession, sf_dir: str) -> int:
    return load_documents(spark, sf_dir).agg(F.max("doc_id")).first()[0] + 1


def directed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct directed (src, dst) per the graph law. One narrow explode;
    the DISTINCT is the only shuffle and Catalyst prunes to the doc_id column
    (scan reads a single parquet column)."""
    n = num_vertices(spark, sf_dir)
    docs = load_documents(spark, sf_dir).select(F.col("doc_id").cast("long"))
    h = ((F.col("doc_id") % MOD) * F.lit(MUL_A) + F.col("j") * F.lit(MUL_B) + F.lit(ADD_C)) % F.lit(MOD)
    dst = F.when(h % HUB_MOD < HUB_CUT, h % N_HUBS).otherwise(h % F.lit(n))
    return (
        docs.withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(K_OUT - 1))))
        .select(F.col("doc_id").alias("src"), dst.alias("dst"))
        .where(F.col("dst") != F.col("src"))
        .distinct()
    )


def undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected edge set: distinct (a < b). Self-loops already
    excluded by the law."""
    e = directed_edges(spark, sf_dir)
    return (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        ).distinct()
    )


def vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(num_vertices(spark, sf_dir)).select(F.col("id").alias("v"))


# deterministic synthetic positive weight 1..5 per directed edge — the
# link-multiplicity stand-in for the weighted-PageRank gate; the DuckDB
# oracle applies the same law (WEIGHT_SQL) so values agree bit-for-bit
WEIGHT_SQL = "((src * 7 + dst * 13) % 5 + 1)"


def weighted_directed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, w): directed_edges decorated with the deterministic
    weight law above — pure projection, no extra shuffle."""
    return directed_edges(spark, sf_dir).withColumn(
        "w", ((F.col("src") * 7 + F.col("dst") * 13) % 5 + 1).cast("long")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL fragments (ANSI, arithmetic identical to the Spark law)
# ---------------------------------------------------------------------------

# MATERIALIZED: these CTEs are referenced many times by the iterative
# oracles (unrolled PageRank/LPA); DuckDB inlines plain CTEs per reference,
# which would recompute the DISTINCT each time (and blow up exponentially
# across a 20-step unrolled chain).
EDGES_CTE = f"""
lg_n AS MATERIALIZED (SELECT MAX(doc_id) + 1 AS n FROM documents),
lg_raw AS (
  SELECT d.doc_id AS src,
         ((d.doc_id % {MOD}) * {MUL_A} + j.j * {MUL_B} + {ADD_C}) % {MOD} AS h,
         lg_n.n AS n
  FROM documents d, (SELECT UNNEST(range({K_OUT})) AS j) j, lg_n
),
lg_edges AS MATERIALIZED (
  SELECT DISTINCT src,
         CASE WHEN h % {HUB_MOD} < {HUB_CUT} THEN h % {N_HUBS} ELSE h % n END AS dst
  FROM lg_raw
  WHERE (CASE WHEN h % {HUB_MOD} < {HUB_CUT} THEN h % {N_HUBS} ELSE h % n END) <> src
),
lg_undirected AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM lg_edges
),
lg_vertices AS MATERIALIZED (
  SELECT UNNEST(range((SELECT n FROM lg_n))) AS v
)
"""


# ---------------------------------------------------------------------------
# SimpleStream-style synthetic edge generator (bench-scale; no oracle needed)
# ---------------------------------------------------------------------------

def er_toggle_stream(
    spark: SparkSession,
    n_vertices: int,
    p_edge: float,
    rounds: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Insert/delete churn stream whose FINAL graph is G(n, p): every vertex
    pair is toggled in each of ``rounds``-1 full rounds (insert, delete,
    insert, ...), then a hash-predicate correction round decides final
    presence — the reference's Erdős–Rényi streamer family
    (/root/reference/tools/streaming/gz_specific/gz_sequential_streamer.cpp:42-95:
    R-1 toggle rounds + correction round with `(hash & 0xffffff) > cutoff`).

    Returns (upd_idx, a, b, round). Net presence of {a,b} = (rounds-1 toggles
    + correction) parity: pairs passing the predicate end PRESENT iff the
    total toggle count is odd. ~50% of updates are deletions for rounds>=3.
    """
    n = n_vertices
    cutoff = int(p_edge * MOD)
    pair = spark.range(n * (n - 1) // 2).select(F.col("id").alias("pid"))
    # decode pid -> (a, b) canonical upper-triangle pair
    # a = floor((2n-1 - sqrt((2n-1)^2 - 8*pid)) / 2), b = pid - a*(2n-1-a)/2 + a + 1
    a = F.floor(
        (F.lit(2 * n - 1) - F.sqrt(F.lit((2 * n - 1) ** 2) - 8 * F.col("pid"))) / 2
    ).cast("long")
    b = (F.col("pid") - a * (F.lit(2 * n - 1) - a) / 2 + a + 1).cast("long")
    pairs = pair.select("pid", a.alias("a"), b.alias("b"))
    h = F.pmod(F.xxhash64("pid", F.lit(seed)), F.lit(MOD))
    keep = (h < F.lit(cutoff)).alias("final_present")
    pairs = pairs.select("pid", "a", "b", keep)
    streams = []
    n_pairs = n * (n - 1) // 2
    for r in range(rounds - 1):  # full toggle rounds
        streams.append(
            pairs.select(
                (F.col("pid") + F.lit(r * n_pairs)).alias("upd_idx"),
                "a",
                "b",
                F.lit(r).alias("round"),
            )
        )
    # correction round: toggle once more iff parity(rounds-1) != final_present
    want_toggle = (
        F.lit((rounds - 1) % 2 == 1) != F.col("final_present")
    )
    streams.append(
        pairs.where(want_toggle).select(
            (F.col("pid") + F.lit((rounds - 1) * n_pairs)).alias("upd_idx"),
            "a",
            "b",
            F.lit(rounds - 1).alias("round"),
        )
    )
    out = streams[0]
    for s in streams[1:]:
        out = out.unionAll(s)
    return out


def _next_prime(x: int) -> int:
    """Smallest prime >= x (trial division; fine up to ~1e12)."""
    if x <= 2:
        return 2
    c = x | 1
    while True:
        d, is_p = 3, c % 2 != 0
        while is_p and d * d <= c:
            if c % d == 0:
                is_p = False
            d += 2
        if is_p:
            return c
        c += 2


STRIDE_K = 48_271  # minstd multiplier; gcd(k, p)=1 for any prime p > k


def er_hash_stream(
    spark: SparkSession,
    n_vertices: int,
    p_edge: float,
    rounds: int = 3,
    seed: int = 42,
    sequential: bool = False,
) -> DataFrame:
    """O(1)-state-per-update Erdős–Rényi churn streamer — the Spark rendition
    of the reference's HashStreamer / GZNonsequentialStreamer
    (/root/reference/tools/streaming/hash_streamer.h:8-27 round semantics,
    /root/reference/tools/streaming/gz_specific/gz_nonsequential_streamer.h:9-27
    prime-stride enumeration). Any update is a pure column expression of its
    enumeration index — NOTHING is materialized (unlike er_toggle_stream,
    which builds the full pair table and cannot reach erdos20-class streams).

    Enumeration: prime p >= n(n-1)/2; per round visit pair ids e = (i*k) % p
    for i in 0..p-1 (a permutation of 0..p-1 — i=0 maps to pair 0, so edge
    (0,1) is enumerated like every other residue; sequential=True visits i
    directly), skipping e >= n_pairs. Round 0 inserts pairs with bit0(h1)=1;
    round r toggles pairs whose h1 bits r-1, r differ; the final round
    corrects each pair to its target G(n, p) presence: h2-based predicate
    pmod(xxhash64(e, seed+1), 2^31) < p_edge * 2^31 — so the NET graph
    depends only on h2 (see er_hash_net_edges, the exact oracle).

    Returns (upd_idx, a, b, round, is_insert); upd_idx has gaps (enumeration
    slots with no update are skipped, as in the reference's next() loop).

    Supported range: n <= 2^24. Beyond that, i*STRIDE_K overflows int64 once
    prime ~ n^2/2 exceeds ~1.9e14, and the triangular decode's double sqrt
    loses exactness past 2^53 — both corrupt the enumeration silently, so the
    bound is asserted. Larger n needs 128-bit modmul + integer isqrt.
    """
    n = n_vertices
    if n > (1 << 24):
        # a ValueError, not an assert: `python -O` strips asserts, which
        # would silently re-enable the int64-overflow corruption this
        # bound exists to prevent
        raise ValueError(
            f"er_hash_stream supports n <= 2^24 (got {n}): the prime-stride "
            "product and the triangular sqrt decode exceed exact int64/double "
            "range beyond it"
        )
    n_pairs = n * (n - 1) // 2
    prime = _next_prime(max(n_pairs, 3))
    assert rounds >= 2
    cutoff = int(p_edge * MOD)
    per_round = prime
    total = rounds * per_round
    idx = F.col("id")
    i = idx % per_round
    r = (idx / per_round).cast("long")
    e = ((i * STRIDE_K) % prime) if not sequential else i
    base = spark.range(total).select(
        idx.alias("upd_idx"), r.alias("round"), e.alias("e")
    ).where(F.col("e") < n_pairs)
    # triangular decode e -> canonical pair (a < b)
    a = F.floor(
        (F.lit(2 * n - 1) - F.sqrt(F.lit(float((2 * n - 1) ** 2)) - 8 * F.col("e"))) / 2
    ).cast("long")
    b = (F.col("e") - a * (F.lit(2 * n - 1) - a) / 2 + a + 1).cast("long")
    staged = base.select(
        "upd_idx",
        "round",
        a.alias("a"),
        b.alias("b"),
        F.xxhash64("e", F.lit(seed)).alias("h1"),
        (F.pmod(F.xxhash64("e", F.lit(seed + 1)), F.lit(MOD)) < F.lit(cutoff)).alias(
            "want"
        ),
    )
    bit_r = F.expr("(shiftright(h1, cast(round as int)) & 1)")
    bit_prev = F.expr("(shiftright(h1, cast(round as int) - 1) & 1)")
    bit_last = F.expr(f"(shiftright(h1, {rounds - 2}) & 1)")
    rr = F.col("round")
    emit_col = (
        F.when(rr == 0, F.expr("(h1 & 1)") == 1)
        .when(rr < rounds - 1, bit_r != bit_prev)
        .otherwise((bit_last == 1) != F.col("want"))
    )
    type_col = (
        F.when(rr == 0, F.lit(True))
        .when(rr < rounds - 1, bit_r == 1)
        .otherwise(F.col("want"))
    )
    return staged.where(emit_col).select(
        "upd_idx", "a", "b", "round", type_col.alias("is_insert")
    )


def er_hash_net_edges(
    spark: SparkSession, n_vertices: int, p_edge: float, seed: int = 42
) -> DataFrame:
    """The exact net-graph oracle for er_hash_stream: pair e is present in
    the final graph iff the correction predicate holds — independent of the
    churn rounds. One pass over the pair-id range (still no pair-set state;
    use only at oracle-scale n)."""
    n = n_vertices
    n_pairs = n * (n - 1) // 2
    cutoff = int(p_edge * MOD)
    e = F.col("id")
    a = F.floor(
        (F.lit(2 * n - 1) - F.sqrt(F.lit(float((2 * n - 1) ** 2)) - 8 * e)) / 2
    ).cast("long")
    b = (e - a * (F.lit(2 * n - 1) - a) / 2 + a + 1).cast("long")
    h2 = F.pmod(F.xxhash64(e, F.lit(seed + 1)), F.lit(MOD))
    return (
        spark.range(n_pairs)
        .where(h2 < F.lit(cutoff))
        .select(a.alias("a"), b.alias("b"))
    )


def verify_stream(stream: DataFrame) -> DataFrame:
    """Stream well-formedness verifier (the reference's tooling analog,
    /root/reference/tools/streaming/verify_stream.cpp:7-29): within each pair
    (ordered by upd_idx) update types must alternate starting with INSERT —
    no double-insert, no double-delete, no delete-before-insert. Returns the
    violating rows (empty = well-formed). One window partitioned BY PAIR —
    parallel across pairs, never a global window."""
    from pyspark.sql import Window

    w = Window.partitionBy("a", "b").orderBy("upd_idx")
    rn = F.row_number().over(w)
    return (
        stream.withColumn("rn", rn)
        .where(F.col("is_insert") != (F.pmod(F.col("rn"), F.lit(2)) == 1))
        .select("upd_idx", "a", "b", "is_insert")
    )


def net_edges(stream: DataFrame) -> DataFrame:
    """Stream -> static net-presence graph: edges with ODD update count
    survive (insert/delete cancel pairwise) — the reference's stream->static
    converter (/root/reference/tools/to_static.cpp:11-58). Input columns
    (a, b) in any order; output canonical (a < b) distinct."""
    canon = stream.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    ).where(F.col("a") != F.col("b"))
    return (
        canon.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") % 2 == 1)
        .select("a", "b")
    )


def synth_edge_stream(
    spark: SparkSession, n_vertices: int, n_updates: int, seed: int = 42
) -> DataFrame:
    """Deterministic O(1)-state edge stream generator: hash of the update
    index -> (src, dst) with source skew via min-of-two-hashes — the Spark
    rendition of the reference's SimpleStream
    (/root/reference/experiment/simple_stream.h:77-91). Used for ingest
    benchmarks at arbitrary scale; columns (upd_idx, src, dst).

    n_vertices must be a power of two (as in simple_stream.h:24-28).
    """
    assert n_vertices & (n_vertices - 1) == 0, "n_vertices must be a power of 2"
    mask = n_vertices - 1
    idx = F.col("id")
    h1 = F.xxhash64(idx, F.lit(seed))
    h2 = F.xxhash64(idx, F.lit(seed + 1))
    h3 = F.xxhash64(idx, F.lit(seed + 2))
    # skewed src: min of two masked hashes (simple_stream.h:85-90)
    src = F.least(F.pmod(h1, F.lit(mask + 1)), F.pmod(h2, F.lit(mask + 1)))
    dst = F.pmod(h3, F.lit(mask + 1))
    df = (
        spark.range(n_updates)
        .select(
            idx.alias("upd_idx"),
            src.alias("src"),
            dst.alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    return df


def rmat_stream(
    spark: SparkSession,
    n_log2: int,
    n_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> DataFrame:
    """Graph500-style R-MAT edge generator (Chakrabarti et al., SDM'04) —
    THE standard skewed benchmark generator for web/social graphs (the
    Graph500 spec fixes (a,b,c,d) = (.57,.19,.19,.05); d = 1-a-b-c).

    Each of ``n_edges`` edges descends ``n_log2`` quadrant levels; the
    level-l coin is xxhash64(edge_idx, l, seed) mapped into [0,1) via its
    top 53 bits, so the stream is fully deterministic, O(1)-state, and a
    pure zero-shuffle JVM projection (the er_hash_stream standard — at
    10^12 edges nothing is materialized but the projection itself).
    Output (upd_idx, src, dst) on 2^n_log2 vertices; R-MAT semantics keep
    self-loops and duplicate edges (canonicalize downstream if needed).
    """
    assert 0 < a and 0 < b and 0 < c and a + b + c < 1
    levels = int(n_log2)
    src_expr = F.lit(0).cast("long")
    dst_expr = F.lit(0).cast("long")
    for lvl in range(levels):
        u = (
            F.shiftrightunsigned(
                F.xxhash64(F.col("id"), F.lit(lvl), F.lit(seed)), 11
            ).cast("double")
            / F.lit(float(1 << 53))
        )
        sbit = F.when(u >= F.lit(a + b), F.lit(1)).otherwise(F.lit(0))
        dbit = F.when(
            (u >= F.lit(a)) & (u < F.lit(a + b)), F.lit(1)
        ).otherwise(
            F.when(u >= F.lit(a + b + c), F.lit(1)).otherwise(F.lit(0))
        )
        src_expr = src_expr + (sbit.cast("long") * F.lit(1 << lvl))
        dst_expr = dst_expr + (dbit.cast("long") * F.lit(1 << lvl))
    return spark.range(int(n_edges)).select(
        F.col("id").alias("upd_idx"),
        src_expr.alias("src"),
        dst_expr.alias("dst"),
    )
