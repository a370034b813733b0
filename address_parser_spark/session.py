"""SparkSession factory with scale-appropriate defaults.

One place to encode the engine's execution posture: AQE on (runtime skew-join
splitting + partition coalescing), Arrow exchange for pandas UDFs, bounded
shuffle partitions for local runs. On a real cluster these are spark-submit
confs; the factory only fills in what is unset so cluster configs win.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(app_name: str = "address_parser_spark", master: str | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for key, value in {**DEFAULT_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
