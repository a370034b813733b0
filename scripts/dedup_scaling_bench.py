"""Two-parallelism-level scaling evidence for the dedup operator family.

Same protocol as scripts/scaling_bench.py (which covers the ER pipeline, the
north_rule's headline job): deterministic corpus generated ONCE to parquet;
each level taskset-pinned to exactly N CPUs in a fresh JVM; full-shape
warm-up on a slice; reps interleaved (low, high, low, high, …) with
best-of-N per level to approximate uncontended capability on the shared
sandbox host. Results are recorded in BASELINE.md §"Dedup-family scaling"
with raw campaign logs committed under bench_logs/.

The measured job is the representative dedup sweep over the synthetic
documents corpus (sources.documents.synth_documents_spark): exact dedup +
MinHash-LSH band pairs + shingle-Jaccard pairs (fast_hash/xxhash64 — the
production path), each fully materialized through the noop sink.

Usage: python scripts/dedup_scaling_bench.py [n_docs] [low_cores] [high_cores] [reps]
Prints one JSON line.
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
from address_parser_spark.sources.documents import synth_documents_spark
spark = get_spark("gen", master="local[16]")
spark.sparkContext.setLogLevel("ERROR")
synth_documents_spark(spark, {n_docs}, partitions=64).write.mode("overwrite").parquet({corpus!r})
synth_documents_spark(spark, {warm_docs}, partitions=16).write.mode("overwrite").parquet({warm!r})
spark.stop()
"""

_RUN_SNIPPET = """
import json, time, sys
sys.path.insert(0, {repo!r})
from address_parser_spark.session import get_spark
from address_parser_spark.operators.dedup import (
    exact_duplicates, minhash_band_pairs, ngram_jaccard_pairs,
)

def sweep(docs):
    for df in (
        exact_duplicates(docs),
        minhash_band_pairs(docs, fast_hash=True),
        ngram_jaccard_pairs(docs, threshold=0.5, fast_hash=True),
    ):
        df.write.format("noop").mode("overwrite").save()

cores = {cores}
spark = get_spark("dedup_scaling", master=f"local[{{cores}}]")
spark.sparkContext.setLogLevel("ERROR")
sweep(spark.read.parquet({warm!r}))
docs = spark.read.parquet({corpus!r})
start = time.monotonic()
sweep(docs)
elapsed = time.monotonic() - start
print(json.dumps({{"cores": cores, "docs": {n_docs}, "sec": round(elapsed, 2),
                   "docs_per_sec": round({n_docs} / elapsed, 2)}}))
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    with tempfile.TemporaryDirectory(prefix="dedup_scaling_") as tmp:
        corpus = f"{tmp}/docs"
        warm = f"{tmp}/warm"
        subprocess.run(
            [sys.executable, "-c", _GEN_SNIPPET.format(
                repo=str(REPO), n_docs=n_docs, corpus=corpus,
                warm=warm, warm_docs=max(n_docs // 16, 512))],
            check=True, capture_output=True, text=True, timeout=6000,
        )

        raw = {low: [], high: []}
        for _ in range(reps):
            for cores in (low, high):
                pin = ["taskset", "-c", f"0-{cores - 1}"]
                out = subprocess.run(
                    pin + [sys.executable, "-c", _RUN_SNIPPET.format(
                        repo=str(REPO), cores=cores, corpus=corpus, warm=warm, n_docs=n_docs)],
                    capture_output=True, text=True, timeout=6000,
                )
                lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
                if not lines:
                    raise RuntimeError(f"{cores}-core run failed:\n{out.stderr[-2000:]}")
                raw[cores].append(json.loads(lines[-1]))
        results = {c: max(raw[c], key=lambda r: r["docs_per_sec"]) for c in (low, high)}

    factor = high / low
    efficiency = results[high]["docs_per_sec"] / (factor * results[low]["docs_per_sec"])
    print(json.dumps({
        "job": "dedup_sweep",
        "docs": n_docs,
        "low": results[low],
        "high": results[high],
        "all_reps": {str(k): [r["docs_per_sec"] for r in v] for k, v in raw.items()},
        "scale_factor": factor,
        "scaling_efficiency": round(efficiency, 3),
        "meets_0_8": efficiency >= 0.8,
    }))


if __name__ == "__main__":
    main()
