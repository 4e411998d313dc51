"""SparkSession factory with the engine's scale-oriented defaults.

Single place for the conf the 100 TB design relies on: AQE (runtime
broadcast conversion, partition coalescing, skew-join splitting),
Arrow execution for the pandas-UDF kernels, and shuffle-partition
sizing. On a real cluster the same conf ships via
``spark-submit --py-files`` (north rule); locally we pin
``local[N]`` so the bench can compare N vs 4N cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF = {
    # AQE: runtime re-plan — broadcast conversion, coalesce, skew split
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    # Arrow boundary for the pandas-UDF kernels
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # parquet scans keep pushdown + vectorized reader (defaults, pinned)
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(app: str = "cdap_geo_spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    b = (SparkSession.builder.appName(app)
         .master(f"local[{cores}]")
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.driver.memory",
                 os.environ.get("SPARK_DRIVER_MEMORY", "16g")))
    for k, v in {**ENGINE_CONF, **(extra_conf or {})}.items():
        b = b.config(k, v)
    return b.getOrCreate()
