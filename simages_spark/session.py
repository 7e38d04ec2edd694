"""SparkSession factory with the engine's canonical configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_dir() -> str:
    for cand in ("/dev/shm/spark-local", "/tmp/spark-local"):
        try:
            os.makedirs(cand, exist_ok=True)
            return cand
        except OSError:
            continue
    return "/tmp"


def get_spark(
    app_name: str = "simages_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    # resolve driver memory ONCE, honoring an extra_conf override: the
    # -Xms below must track whatever spark.driver.memory ends up being —
    # a pinned -Xms24g with an overridden -Xmx4g aborts the JVM at launch
    # ("Initial heap size set to a larger value than the maximum")
    driver_mem = (extra_conf or {}).get(
        "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g")
    )
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (Spark's legacy parquet timestamp encoding) carries NO
        # footer min/max statistics, which blinds every stats-pruned path
        # (SnapshotTable.scan/delete_where) on timestamp columns like
        # warc_ts; TIMESTAMP_MICROS is the modern type, matches Spark's
        # internal precision exactly, and gets stats
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode = driver-only: give the one JVM real memory (the box
        # has 128 GiB); a small heap makes cache+execution churn/GC the
        # bottleneck long before CPU
        .config("spark.driver.memory", driver_mem)
        # this sandbox's virtio disk has ~50ms file-metadata latency; the
        # bypass shuffle writer opens R files per map task and spends 10×
        # more time creating files than writing bytes. tmpfs local dir +
        # the single-file sort writer remove the pathology. (On a real
        # cluster leave local dirs on instance storage — this is a local-
        # mode tuning, not an engine semantic.)
        .config("spark.local.dir", _local_dir())
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
        # Firecracker-VM JVM tuning, each measured in this sandbox:
        # -Xms == -Xmx: G1 otherwise uncommits/recommits heap regions and
        #   every recommit page-faults through the slow host path (observed
        #   9.5s young pauses with User=0.00s Sys=9.51s);
        # capped GC threads: G1's default one-GC-thread-per-CPU serializes
        #   pauses on stolen vCPUs (identical query 23-52s -> 0.7-3s);
        # more C2 threads: first execution JIT-compiles Spark's large
        #   generated methods, 2 compiler threads starve under 32 task
        #   threads.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} "
            "-XX:ParallelGCThreads=8 -XX:ConcGCThreads=2 -XX:CICompilerCount=6",
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
