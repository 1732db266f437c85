"""SparkSession factory.

One session for the whole engine (the reference builds 5 separate
sessions, one per OS-process stage - `run_pipeline.ps1:18-40`; we keep a
single driver-resident DAG instead, SURVEY.md SS3).

Scale defaults: AQE on everywhere (the reference enabled it only in its
ML stages, `forecasting_model.py:44-45`), shuffle partitions sized from
the local core count but overridable for cluster deployments, UTC
session timezone so timestamp semantics are deterministic across
engines, and Arrow enabled for any pandas interchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "smart-energy-analytics",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[N]`` with N = $SPARK_GRAFT_CPUS or all cores.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
            or os.environ.get("SPARK_GRAFT_CPUS")
            or os.cpu_count()
            or 32
        )
    # In local mode the "cluster" is one JVM: executors, shuffle state
    # and the driver share a single heap, and Spark's 1g default OOMs
    # long before the machine does (measured: a 10M-row window probe on
    # local[32] died at 1g on a 128 GiB box). Only effective when this
    # session launches the JVM - a foreign session's heap is its own.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata parquet carries INT64 TIMESTAMP(NANOS); Spark reads it
        # as long under this flag and sources/catalog.py converts to
        # TimestampType via integer division (never float - precision).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # Session-drift lever (PERFORMANCE.md r11): extra driver-JVM flags
    # (GC choice, -Xms pinning, pre-touch) injected by measurement
    # harnesses without a code change. Local mode = one JVM, so driver
    # flags are the whole story; only effective at JVM launch.
    java_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
