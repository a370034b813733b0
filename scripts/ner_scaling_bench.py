"""NER bulk-pipeline scaling campaign (VERDICT r4 ask #4).

``plans/ner_pipeline.py`` mirrors the reference's own web-scale entry point
(``ner/build_real_dataset.py:159-247``): resolve → completeness filter →
BIO labeling → all-matched filter → deterministic split. This campaign
measures that full path (pages parquet → run_pipeline → build_ner_dataset →
both splits materialized) at two pinned core widths under the same hermetic
interleaved best-of-N protocol as scaling_bench.py.

Usage: python scripts/ner_scaling_bench.py [n_pages] [low] [high] [reps]
Prints one JSON line; campaign rows live in BASELINE.md §"Measured scaling".
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_GEN_SNIPPET = """
import sys
sys.path.insert(0, {repo!r})
from address_parser_spark.session import get_spark
from address_parser_spark.gazetteer import synth_gazetteer
from address_parser_spark.sources.pages import synth_pages_spark
spark = get_spark("gen", master="local[16]")
spark.sparkContext.setLogLevel("ERROR")
gaz = synth_gazetteer()
synth_pages_spark(spark, gaz, {n_pages}, partitions=64).write.mode("overwrite").parquet({corpus!r})
synth_pages_spark(spark, gaz, {warm_pages}, partitions=16).write.mode("overwrite").parquet({warm!r})
spark.stop()
"""

_RUN_SNIPPET = """
import json, time, sys
sys.path.insert(0, {repo!r})
from address_parser_spark.session import get_spark
from address_parser_spark.gazetteer import synth_gazetteer
from address_parser_spark.plans.ner_pipeline import build_ner_dataset
from address_parser_spark.plans.pipeline import run_pipeline

cores = {cores}
spark = get_spark("ner-scaling", master=f"local[{{cores}}]")
spark.sparkContext.setLogLevel("ERROR")
gaz = synth_gazetteer()

def job(pages):
    resolved = run_pipeline(spark, pages, gaz)
    train, test = build_ner_dataset(resolved)
    train.write.format("noop").mode("overwrite").save()
    test.write.format("noop").mode("overwrite").save()

job(spark.read.parquet({warm!r}))  # warm-up: full shape on a slice
pages = spark.read.parquet({corpus!r})
start = time.monotonic()
job(pages)
elapsed = time.monotonic() - start
print(json.dumps({{"cores": cores, "pages": {n_pages}, "sec": round(elapsed, 2),
                   "pages_per_sec": round({n_pages} / elapsed, 2)}}))
spark.stop()
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    with tempfile.TemporaryDirectory(prefix="ner_scaling_") as tmp:
        corpus, warm = f"{tmp}/pages", f"{tmp}/warm"
        subprocess.run(
            [sys.executable, "-c", _GEN_SNIPPET.format(
                repo=str(REPO), n_pages=n_pages, corpus=corpus,
                warm=warm, warm_pages=max(n_pages // 16, 256))],
            check=True, capture_output=True, text=True, timeout=6000,
        )

        raw: dict[int, list[dict]] = {low: [], high: []}
        # interleave the width levels — host-noise protocol (see memory)
        for _ in range(reps):
            for cores in (low, high):
                pin = ["taskset", "-c", f"0-{cores - 1}"]
                out = subprocess.run(
                    pin + [sys.executable, "-c", _RUN_SNIPPET.format(
                        repo=str(REPO), cores=cores, corpus=corpus,
                        warm=warm, n_pages=n_pages)],
                    capture_output=True, text=True, timeout=6000,
                )
                lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
                if not lines:
                    raise RuntimeError(f"{cores}-core run failed:\n{out.stderr[-2000:]}")
                raw[cores].append(json.loads(lines[-1]))

    best = {c: max(v, key=lambda r: r["pages_per_sec"]) for c, v in raw.items()}
    factor = high / low
    efficiency = best[high]["pages_per_sec"] / (factor * best[low]["pages_per_sec"])
    print(json.dumps({
        "job": "ner_bulk_pipeline",
        "pages": n_pages,
        "low": best[low],
        "high": best[high],
        "all_reps": {str(k): [r["pages_per_sec"] for r in v] for k, v in raw.items()},
        "scale_factor": factor,
        "scaling_efficiency": round(efficiency, 3),
        "meets_0_8": efficiency >= 0.8,
    }))


if __name__ == "__main__":
    main()
