"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]``; on a real cluster the same builder
runs unmodified under ``spark-submit --py-files`` — every knob here is
either scale-neutral (AQE, Arrow) or derived from the cpu count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "careers_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cpus: parallelism for local mode (defaults to $SPARK_GRAFT_CPUS or '*').
    shuffle_partitions: defaults to max(cpus, 32) locally; on a real
    cluster AQE coalescing makes the static value non-critical.
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cpus}]"
        n = cpus
    if shuffle_partitions is None:
        shuffle_partitions = max(n, 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # 6g measured sweet spot on this workload: G1 on a 48g heap burns
        # 2-3x CPU (sweep at local[32], 1M convs: 4g=56s, 8g=76s,
        # 16g=112s, 48g=195s); broadcast dims are heap-guarded anyway
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "6g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
