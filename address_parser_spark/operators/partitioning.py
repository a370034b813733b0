"""Scan-width defense for CPU-heavy operators.

Parquet splits at row-group granularity, so a table delivered as a few large
single-row-group files (or one small file) scans as 1-2 partitions no matter
what ``spark.sql.files.maxPartitionBytes`` asks for — and every downstream
CPU-heavy projection (shingle explosion, hash signatures, per-token math)
then runs on one core while the rest of the cluster idles. Measured at
sf0.1 (one 0.6 MB single-row-group documents file, local[32]): the shingle
scan stage alone took 8.9 s serialized vs 1.9 s after a round-robin
repartition — the whole Jaccard pipeline dropped 22 s → 8 s.

``fan_out`` only fires when the plan's scan parallelism is below half the
session's default parallelism. At 100 TB the input exposes thousands of
splits, the condition is false, and the helper is a strict no-op — no
shuffle is ever added on the scale path. When it does fire the input is by
construction a handful of partitions, so the one-time round-robin exchange
of a narrow projection costs far less than the serialized compute it
unlocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism IFF the
    incoming plan exposes fewer than half that many partitions."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if target <= 2:
        return df
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - plans that cannot convert to RDD
        return df
    if current * 2 < target:
        return df.repartition(target)
    return df
