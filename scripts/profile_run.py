"""Job-level attribution of the ER pipeline's serial floor.

Runs ``run_pipeline`` exactly the way scaling_bench does (warm-up run, then a
measured run over pre-materialized parquet) but with the pipeline's own
``timings`` instrumentation on, so every eager barrier (checkpoint job), the
CC loop, and the final lazy write are individually attributed. The per-round
stage-timing tables derived from it live in BASELINE.md §"Measured scaling".

Usage: python scripts/profile_run.py <corpus_parquet> <warm_parquet> <cores>
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    corpus, warm_path = sys.argv[1], sys.argv[2]
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from address_parser_spark.gazetteer import synth_gazetteer
    from address_parser_spark.plans.pipeline import run_pipeline
    from address_parser_spark.session import get_spark

    spark = get_spark("profile_run", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    gaz = synth_gazetteer()

    warm = spark.read.parquet(warm_path)
    run_pipeline(spark, warm, gaz).write.format("noop").mode("overwrite").save()

    pages = spark.read.parquet(corpus)
    n_pages = pages.count()

    timings: dict = {}
    start = time.monotonic()
    out = run_pipeline(spark, pages, gaz, timings=timings)
    t_build = time.monotonic()
    out.write.format("noop").mode("overwrite").save()
    t_end = time.monotonic()
    timings["final_write"] = round(t_end - t_build, 2)
    total = t_end - start
    attributed = sum(v for k, v in timings.items() if k != "cc_rounds")
    print(json.dumps({
        "cores": cores,
        "pages": n_pages,
        "total_sec": round(total, 2),
        "attributed_sec": round(attributed, 2),
        "pages_per_sec": round(n_pages / total, 2),
        "timings": timings,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
