"""SparkSession factory with the engine's standard configuration.

Local-mode testing uses ``local[N]``; on a real cluster the same builder is
driven by spark-submit --py-files (reference deploy analog:
/root/reference/tools/run_experiments.sh:141-160 launches MPI ranks; we launch
executors instead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "landscape_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults favor the 100TB design point: AQE on (runtime re-plan, skew-join
    splitting, small-partition coalescing), Arrow transfer for every
    Python-side kernel, shuffle partitions sized to cores locally (a cluster
    deploy overrides via --conf).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = 32 if inner == "*" else max(8, int(inner))
        else:
            shuffle_partitions = 200
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # tmpfs shuffle dir when available: local-mode shuffle files on disk cost
    # ~10% end-to-end; real clusters provision fast local disks for this.
    # tmpfs is typically capped at half RAM, so gate behind a free-space check
    # (>= 16 GiB) — large spills fall back to the default disk local dir,
    # which succeeds where a full tmpfs would fail the job. Opt out entirely
    # with SPARK_GRAFT_NO_SHM=1.
    if os.path.isdir("/dev/shm") and not os.environ.get("SPARK_GRAFT_NO_SHM"):
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize >= 16 * (1 << 30):
            shm = "/dev/shm/spark-local"
            os.makedirs(shm, exist_ok=True)
            builder = builder.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def local_parallelism(spark: SparkSession, default: int = 32) -> int:
    """Target parallelism for the zero-shuffle kernels' small-corpus
    repartition guard (minhash/simhash/substring fingerprints).

    ``spark.sql.shuffle.partitions`` is not guaranteed numeric on every
    platform (some AQE-managed deployments set it to 'auto'), and int() on
    such a value raised ValueError at operator call time. Fall back to the
    scheduler's defaultParallelism, then to ``default``."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", str(default)))
    except (TypeError, ValueError):
        try:
            return int(spark.sparkContext.defaultParallelism)
        except Exception:
            return default
