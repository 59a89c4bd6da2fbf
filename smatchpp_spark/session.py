"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB design point, not just local testing:
  * AQE on (runtime coalescing, skew-join splitting, broadcast demotion),
  * Arrow on (every Python kernel in this engine is Arrow-batched),
  * skew-join handling on (hub vertices in web-scale link graphs),
  * sensible shuffle partitioning that callers override per cluster size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "smatchpp-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster callers pass ``None`` and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # one partition per core locally; on a cluster this is overridden
        # (rule of thumb: 2-3x total executor cores, AQE coalesces down).
        n = cpus if cpus != "*" else os.cpu_count() or 8
        shuffle_partitions = int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep the layout of persisted tables visible to consumers: with
        # the Spark 4 default (true) a cached plan runs under AQE and its
        # output partitioning/ordering become Unknown, so every iterative
        # operator's carefully repartition+sortWithinPartitions'd static
        # join side was re-exchanged and re-sorted on EVERY use (measured
        # in the r08 plan audit: both wedge-join sides of triangle_count
        # re-shuffled a table already hash-partitioned by the join key).
        # false = cached plans keep their partitioning, the superstep /
        # wedge joins reuse the one exchange done at build time.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "false",
        )
        # joins pick broadcast by MEASURED size, not a magic local number:
        # 10m default is tuned for small executors; this box (and the
        # 100 TB design point's executors) comfortably holds a ~100 MB
        # hash relation, and the decision stays size-adaptive — an
        # E-sized side at web scale exceeds the threshold and falls back
        # to a shuffle join (guide §3.1).
        .config("spark.sql.autoBroadcastJoinThreshold", "96m")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "96m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size balances Python-kernel latency vs memory; 10k
        # rows/batch keeps cogrouped alignment kernels well-amortized.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
