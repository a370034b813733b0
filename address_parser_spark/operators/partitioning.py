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

import re

from pyspark.sql import DataFrame

# Optimized-logical-plan node names that mean "this frame is derived through
# a shuffle (or grouped-map) boundary". Probing such a frame's width via
# .rdd would, under AQE, finalize the adaptive plan and EXECUTE every
# upstream shuffle stage just to read a partition count — and then the real
# action re-runs them. Post-shuffle frames are already
# spark.sql.shuffle.partitions wide, so fan_out has nothing to fix there:
# never probe, never fire.
_SHUFFLE_NODES = frozenset({
    "Join", "Aggregate", "Window", "Sort",
    "RepartitionByExpression", "RebalancePartitions", "Deduplicate",
    "GlobalLimit", "CoGroup",
    "FlatMapGroupsInPandas", "FlatMapCoGroupsInPandas", "MapInPandas",
    # A cached frame prints its PHYSICAL child plan inside InMemoryRelation
    # (HashAggregate, Exchange, …) — logical node names never match it, so
    # treat the cache node itself (and any printed Exchange) as not-narrow.
    "InMemoryRelation", "Exchange",
})

# ``coalesce(n)`` and ``repartition(n)`` share the Repartition logical node,
# distinguished by its shuffle flag: "Repartition 4, true" exchanges,
# "Repartition 1, false" is a narrow coalesce (safe to probe — and exactly
# the single-partition shape fan_out exists to widen).
_SHUFFLING_REPARTITION = re.compile(r"\bRepartition \d+, true\b")

# First identifier after the tree-drawing prefix of a plan line — the node
# name (expressions like array_sort(...) appear after it, so they can't
# false-match).
_NODE_NAME = re.compile(r"^[\s:+\-*'(0-9)]*([A-Za-z]+)")


def _is_narrow_over_scan(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().optimizedPlan().toString()  # no execution
    if _SHUFFLING_REPARTITION.search(plan):
        return False
    for line in plan.splitlines():
        m = _NODE_NAME.match(line)
        if m and m.group(1) in _SHUFFLE_NODES:
            return False
    return True


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism IFF the
    incoming plan is narrow-over-scan AND exposes fewer than half that many
    partitions. (Width is probed via .rdd, which is free exactly when the
    plan has no shuffle — the only case fan_out exists for.)"""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if target <= 2:
        return df
    try:
        if not _is_narrow_over_scan(df):
            return df
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - plans that cannot convert to RDD
        return df
    if current * 2 < target:
        return df.repartition(target)
    return df
