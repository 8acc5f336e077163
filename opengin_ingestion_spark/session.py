"""SparkSession factory tuned for the CDC engine.

Defaults chosen for the sandbox (local[N], single JVM) but every knob is the
one you would set on a real multi-executor cluster too: AQE on (runtime
skew-join splitting + partition coalescing), Arrow-vectorized Python UDF
transport, UTC session timezone (so timestamps compare bit-for-bit against
the DuckDB oracle), shuffle partitions sized to cores rather than the
200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "opengin_ingestion_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. ``shuffle_partitions`` defaults to the core count —
    at cluster scale you would size this to ~2-3x total cores and rely on
    AQE coalescing; locally cores is right.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # naive parquet timestamps are UTC wall-clock by engine convention
        # (matches /root/testdata); infer them as TimestampType, not NTZ,
        # so raw spark.read.parquet over a change log agrees with the
        # engine's explicit-schema reads (Spark 4 default would infer
        # timestamp_ntz and trip evolution on timestamp ← timestamp_ntz)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # write timestamps as TIMESTAMP_MICROS, not the deprecated INT96:
        # 8 bytes instead of 12 AND the column gets row-group min/max
        # statistics, which compact(sort_by=[ts]) turns into range
        # pruning (INT96 stats are suppressed by parquet spec)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # local-mode shuffle spills through this dir; tmpfs is the sandbox
        # stand-in for the per-executor NVMe a real cluster would mount
        # (measured 3-6x faster multi-threaded shuffle than /tmp-on-disk)
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_LOCAL_DIRS",
                "/dev/shm/spark_local" if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
        # file-source streaming: don't keep unbounded file listing state
        .config("spark.sql.streaming.fileSource.log.compactInterval", "10")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
