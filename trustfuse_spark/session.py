"""SparkSession factory tuned for this engine.

Defaults target local[N] testing but every knob is the one you would set on a
real multi-executor cluster: AQE on (runtime re-plan + skew-join), Arrow on
(all our UDFs are pandas/Arrow-batched), shuffle partitions sized to cores
rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "trustfuse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] -> N-ish partitions; a real cluster would use 2-3x cores.
        n = cpus if master.startswith("local") else 2 * cpus
        shuffle_partitions = max(n, 8)
    # Shuffle/spill files on tmpfs when available: a single local disk
    # serializes 32 concurrent shuffle writers (measured: the 8->32-core
    # scaling bench was I/O-bound, not CPU-bound). On a real cluster this
    # is per-executor local SSD instead.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.local.dir", local_dir or "/tmp")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce post-shuffle partitions by size, not parallelism: iterative
        # fusion plans have many small shuffles whose per-task overhead
        # otherwise dominates (measured 5x on the CRH loop). The advisory is
        # deliberately small so medium inputs still fan out across cores
        # (64m serialized a ~100MB-shuffle job to 1 partition and inverted
        # the 8->32-core scaling); override via SPARK_GRAFT_ADVISORY.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY", "4m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Let the planner choose shuffled-hash over sort-merge when its size
        # conditions hold (guide §3.1/§9): equi-join results are identical,
        # but SMJ pays a sort of both sides — ruinous when rows carry array
        # payloads (shingle sets, signatures, embeddings). The AQE rewrite
        # threshold below additionally converts planned SMJs whose
        # post-shuffle build partitions are verifiably small at runtime —
        # the guarded form, so a huge build-side partition still gets the
        # spill-safe sort-merge. Both parameterised for cluster overrides.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", "64m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
