"""Structured-Streaming ingest of edge updates into persistent sketch state.

The reference's stream is a replayable file of INSERT/DELETE updates with
breakpointed in-stream queries: inserter threads rendezvous at a registered
stream index, one runs the query (global CC or point-query bursts), ingest
resumes (/root/reference/experiment/cluster_query_expr.cpp:197-332,
pause/unpause machinery src/work_distributor.cpp:136-191).

In Spark the natural rendition is micro-batching: readStream over the edge
source -> foreachBatch -> per-batch sketch DELTA build -> linear XOR merge
into the persistent sketch table. Linearity makes the merge exact regardless
of how the stream is chopped into batches — the sketch after batch k equals
the sketch of the first k batches' union. INSERT and DELETE are the SAME
operation (XOR toggles presence), exactly the reference's linear-sketch
deletion semantics. A "breakpoint query" is simply a Boruvka run on the
committed state after any micro-batch — the batch boundary IS the pause.

State lives as parquet (atomic directory swap per batch), so ingest is
resumable and queries read a consistent snapshot (the analog of the
reference's flush barrier before queries, graph_distrib_update.cpp:122-124).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from landscape_spark.sketch.build import build_sketch_table, xor_merge_by_key
from landscape_spark.sketch.l0 import SketchParams


class SketchStreamIngestor:
    """Maintains a persistent per-vertex sketch table under micro-batched
    edge updates; supports in-stream CC queries on the committed state."""

    def __init__(
        self,
        spark: SparkSession,
        params: SketchParams,
        state_dir: str,
        num_partitions: int = 32,
    ) -> None:
        self.spark = spark
        self.params = params
        self.state_dir = state_dir
        self.num_partitions = num_partitions
        self.batches_seen = 0
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _cur(self) -> str:
        return os.path.join(self.state_dir, "sketches")

    def _has_state(self) -> bool:
        return os.path.exists(os.path.join(self._cur, "_SUCCESS"))

    def current_sketches(self) -> DataFrame | None:
        if not self._has_state():
            return None
        return self.spark.read.parquet(self._cur)

    def absorb_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        """foreachBatch sink: XOR-merge this batch's sketch delta into state.
        batch_df: columns (a, b) — canonical or not; both endpoints update."""
        edges = batch_df.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        ).where(F.col("a") != F.col("b"))
        delta = build_sketch_table(edges, self.params, self.num_partitions)
        cur = self.current_sketches()
        merged = delta if cur is None else xor_merge_by_key(
            cur.unionAll(delta), "vid", self.num_partitions
        )
        tmp = os.path.join(self.state_dir, "sketches_next")
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self._cur):
            shutil.rmtree(self._cur)
        os.replace(tmp, self._cur)
        self.batches_seen += 1

    def start(self, stream_df: DataFrame, trigger_available_now: bool = True):
        """Attach to a streaming DataFrame with columns (a, b). Returns the
        StreamingQuery. Use trigger(availableNow) for replayable file streams
        (the reference's streams are files too, cluster_speed_expr.cpp:46)."""
        writer = stream_df.writeStream.foreachBatch(
            lambda df, bid: self.absorb_batch(df, bid)
        ).option(
            "checkpointLocation", os.path.join(self.state_dir, "_stream_ckpt")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def query_components(self, n_vertices: int) -> DataFrame:
        """In-stream CC query on the committed sketch state (v, comp) for
        edge-incident vertices. The micro-batch boundary is the flush barrier."""
        from landscape_spark.sketch.boruvka import _boruvka_pass

        sketches = self.current_sketches()
        if sketches is None:
            return self.spark.createDataFrame([], "v long, comp long")
        vmap0 = sketches.select(F.col("vid").alias("v"), F.col("vid").alias("comp"))
        vmap, _, _ = _boruvka_pass(
            self.spark,
            sketches,
            vmap0.localCheckpoint(eager=True),
            self.params,
            start_group=0,
            max_groups=self.params.rounds,
            num_partitions=self.num_partitions,
        )
        return vmap
