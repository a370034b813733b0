"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule demands ≥0.8 throughput scaling efficiency from N to 4N executors.
No real cluster exists in this sandbox, so the sanctioned proxy is the same
job at two local parallelism levels on the SAME deterministic input:

    efficiency = throughput(local[4N]) / (4 × throughput(local[N]))

Each level runs in a fresh JVM (subprocess) so executor-thread pools, shuffle
partitions, and memory fractions don't leak between runs. The job is the full
ER pipeline (extract → resolve → keys → pairs → CC) over a generated corpus —
generation itself is distributed and partition-invariant, so both levels see
byte-identical input.

Usage: python scripts/scaling_bench.py [n_pages] [low_cores] [high_cores]
Prints one JSON line; paste results into BASELINE.md / BENCH notes.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_RUN_SNIPPET = """
import json, time, sys
sys.path.insert(0, {repo!r})
from address_parser_spark.session import get_spark
from address_parser_spark.gazetteer import synth_gazetteer
from address_parser_spark.sources.pages import synth_pages_spark
from address_parser_spark.plans.pipeline import run_pipeline

cores = {cores}
n_pages = {n_pages}
spark = get_spark("scaling", master=f"local[{{cores}}]")
spark.sparkContext.setLogLevel("ERROR")
gaz = synth_gazetteer()
pages = synth_pages_spark(spark, gaz, n_pages, partitions=cores * 2)
# Warm the JVM / codegen caches / python-worker pools with a FULL-SHAPE
# pipeline run (same plan, smaller input) so the measured run reflects
# steady-state throughput, not cold-start compilation.
run_pipeline(spark, synth_pages_spark(spark, gaz, max(n_pages // 8, 128), partitions=cores * 2),
             gaz).write.format("noop").mode("overwrite").save()
start = time.monotonic()
run_pipeline(spark, pages, gaz).write.format("noop").mode("overwrite").save()
elapsed = time.monotonic() - start
print(json.dumps({{"cores": cores, "pages": n_pages, "sec": round(elapsed, 2),
                   "pages_per_sec": round(n_pages / elapsed, 2)}}))
spark.stop()
"""


def run_level(cores: int, n_pages: int) -> dict:
    code = _RUN_SNIPPET.format(repo=str(REPO), cores=cores, n_pages=n_pages)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    last = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not last:
        raise RuntimeError(f"run at {cores} cores produced no result:\n{out.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    r_low = run_level(low, n_pages)
    r_high = run_level(high, n_pages)
    factor = high / low
    efficiency = r_high["pages_per_sec"] / (factor * r_low["pages_per_sec"])
    print(json.dumps({
        "job": "er_pipeline",
        "pages": n_pages,
        "low": r_low,
        "high": r_high,
        "scale_factor": factor,
        "scaling_efficiency": round(efficiency, 3),
        "meets_0_8": efficiency >= 0.8,
    }))


if __name__ == "__main__":
    main()
