"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" {name: sec},
"sf"}.

Each query is fully materialized through the noop sink (no driver collect, no
result truncation). The ER pipeline runs on a deterministic synthetic pages
corpus (seed-fixed, generated distributed) and reports its own docs/sec in
the companion key "er_pages_per_sec".

Scaling-efficiency evidence (same job at two parallelism levels) is
produced by scripts/scaling_bench.py; BASELINE.md §"Measured scaling"
holds the recorded results table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BENCH_QUERIES = [
    "pricing_summary",
    "topk_orders_per_customer",
    "hierarchy_rollup",
    "semi_join",
    "anti_join",
    "union_segments",
    "running_total",
    "top_events",
    "events_hourly",
    "events_sessions",
    "events_dedup",
    "token_stats",
    "quality",
    "langid",
    "fingerprints",
    "dedup_exact",
    "minhash_signatures",
    "minhash_band_pairs",
    "embedding_near_dups",
    "simhash",
    "jaccard_pairs",
    "cosine_topk",
    "ann_lsh",
    "media_decode",
    "er_blocking_stats",
    "connected_components",
]


def _fast_overrides():
    """Production-path variants of the hash-heavy operators: xxhash64 instead
    of the md5-through-conv() hashing the DuckDB oracles require. Same
    dataflow shape and thresholds — only the hash function changes (the
    correctness gate still runs the md5 mode via __spark_entry__.queries())."""
    from pyspark.sql import functions as F

    from address_parser_spark.operators.cluster import connected_components
    from address_parser_spark.operators.dedup import (
        minhash_band_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from address_parser_spark.operators.textquality import fingerprints

    def docs(spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    return {
        "minhash_signatures": lambda s, d: minhash_signatures(docs(s, d), fast_hash=True),
        "minhash_band_pairs": lambda s, d: minhash_band_pairs(docs(s, d), fast_hash=True),
        "fingerprints": lambda s, d: fingerprints(docs(s, d), fast_hash=True),
        "jaccard_pairs": lambda s, d: ngram_jaccard_pairs(docs(s, d), threshold=0.12, fast_hash=True),
        "connected_components": lambda s, d: connected_components(
            ngram_jaccard_pairs(docs(s, d), threshold=0.10, fast_hash=True)
            .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        ),
    }

ER_BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_ER_PAGES", "1200"))


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    import __spark_entry__ as entrymod
    from address_parser_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    queries = {**entrymod.queries(), **_fast_overrides()}
    timings: dict[str, float] = {}
    total = 0.0

    # JVM/codegen warm-up, reported as its own counted entry: without it the
    # first query absorbs session startup + whole-stage-codegen compilation
    # (pricing_summary measured ~8 s warm-up-in vs ~2 s true cost) and
    # per-query numbers are not comparable across orderings.
    start = time.monotonic()
    for t in ("lineitem", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").groupBy().count().write.format(
            "noop"
        ).mode("overwrite").save()
    timings["warmup"] = round(time.monotonic() - start, 3)
    total += timings["warmup"]

    for name in BENCH_QUERIES:
        fn = queries[name]
        start = time.monotonic()
        materialize(fn(spark, sf_dir))
        elapsed = round(time.monotonic() - start, 3)
        timings[name] = elapsed
        total += elapsed

    # ER pipeline throughput on the deterministic synthetic corpus. The
    # corpus is materialized to parquet first so the measured job reads from
    # a scan (generation chained lazily would share the extraction stage).
    import tempfile

    from address_parser_spark.gazetteer import synth_gazetteer
    from address_parser_spark.plans.pipeline import run_pipeline
    from address_parser_spark.sources.pages import synth_pages_spark

    gaz = synth_gazetteer()
    with tempfile.TemporaryDirectory(prefix="bench_pages_") as tmp:
        corpus = f"{tmp}/pages"
        synth_pages_spark(spark, gaz, ER_BENCH_PAGES, partitions=int(cpus) * 2)\
            .write.mode("overwrite").parquet(corpus)
        pages = spark.read.parquet(corpus)
        start = time.monotonic()
        materialize(run_pipeline(spark, pages, gaz))
        er_elapsed = round(time.monotonic() - start, 3)
    timings["er_pipeline"] = er_elapsed
    total += er_elapsed

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "er_pages": ER_BENCH_PAGES,
                "er_pages_per_sec": round(ER_BENCH_PAGES / er_elapsed, 2),
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
