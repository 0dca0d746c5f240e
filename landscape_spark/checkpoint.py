"""Per-round checkpoints with per-partition lineage + metrics (north rule).

Every Boruvka round (and any other iterative loop) can persist its state as
parquet plus a lineage JSON capturing: round index, input lineage (previous
round's path), per-partition row counts, row totals, timing metrics, and the
sketch parameters — enough to resume mid-iteration after a failure and to
audit data movement per round (the reference's analog is its status/metrics
side thread, /root/reference/src/work_distributor.cpp:24-90, plus the DSU
cache that lets repeated queries skip recomputation,
/root/reference/src/graph_distrib_update.cpp:107-120).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_counts(df: DataFrame) -> list[int]:
    rows = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    by_pid = {r._pid: r["count"] for r in rows}
    return [by_pid.get(i, 0) for i in range(max(by_pid) + 1)] if by_pid else []


class RoundCheckpointer:
    """Writes {base}/{step}/round=N/{name}.parquet + lineage.json per round."""

    def __init__(self, spark: SparkSession, base_dir: str, step: str) -> None:
        self.spark = spark
        self.dir = os.path.join(base_dir, step)
        os.makedirs(self.dir, exist_ok=True)

    def round_dir(self, rnd: int) -> str:
        return os.path.join(self.dir, f"round={rnd}")

    def save_round(
        self,
        rnd: int,
        dfs: dict[str, DataFrame],
        state: dict[str, Any],
        metrics: dict[str, Any],
    ) -> None:
        rd = self.round_dir(rnd)
        t0 = time.time()
        # 'previous' points at the latest round actually WRITTEN before this
        # one — batched iteration schedules skip round indices (e.g. rounds
        # 0, 4, 6 from 4-then-2 group batching), so round_dir(rnd-1) would
        # be a dangling reference for every round after the first
        earlier = [
            r
            for r in (self._existing_rounds() if rnd > 0 else [])
            if r < rnd
        ]
        lineage: dict[str, Any] = {
            "round": rnd,
            "ts": time.time(),
            "previous": self.round_dir(max(earlier)) if earlier else None,
            "tables": {},
            "state": state,
            "metrics": metrics,
        }
        for name, df in dfs.items():
            path = os.path.join(rd, f"{name}.parquet")
            df.write.mode("overwrite").parquet(path)
            lineage["tables"][name] = {
                "path": path,
                "rows": df.count(),
                "partition_rows": partition_counts(df),
                "schema": df.schema.simpleString(),
            }
        lineage["metrics"]["checkpoint_write_sec"] = round(time.time() - t0, 3)
        tmp = os.path.join(rd, "lineage.json.tmp")
        with open(tmp, "w") as f:
            json.dump(lineage, f, indent=1)
        os.replace(tmp, os.path.join(rd, "lineage.json"))  # atomic, like the
        # reference's status-file rename (work_distributor.cpp:83-88)

    def _existing_rounds(self) -> list[int]:
        return [
            int(d.split("=", 1)[1])
            for d in os.listdir(self.dir)
            if d.startswith("round=")
            and os.path.exists(os.path.join(self.dir, d, "lineage.json"))
        ]

    def latest_round(self) -> int | None:
        rounds = self._existing_rounds()
        return max(rounds) if rounds else None

    def load_round(self, rnd: int) -> tuple[dict[str, DataFrame], dict[str, Any]]:
        rd = self.round_dir(rnd)
        with open(os.path.join(rd, "lineage.json")) as f:
            lineage = json.load(f)
        dfs = {
            name: self.spark.read.parquet(meta["path"])
            for name, meta in lineage["tables"].items()
        }
        return dfs, lineage
