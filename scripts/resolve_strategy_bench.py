"""Broadcast-vs-relational resolve measurement (VERDICT r4 ask #5).

Round 4 measured the relational strategy 7.1× slower than the broadcast
kernel (407 vs 2,910 p/s, 150k pages @ 16 cores) and attributed it to the
candidate shuffle plus per-candidate (non-memoized) scoring. Round 5 added
distinct-std memoization to the relational path (operators/parse.py,
score_candidates: explicit std repartition before the scoring UDF so equal
stds share an Arrow batch and hit the in-batch (std, cand_std) memo). This
script re-measures the trade on the SAME protocol: both strategies
interleaved (b, r, b, r, …), fresh JVM each, pinned to the same cores,
identical parquet input.

Usage: python scripts/resolve_strategy_bench.py [n_pages] [cores] [reps]
Prints one JSON line; the row lives in BASELINE.md §stage attribution.
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
from address_parser_spark.gazetteer.nodes import (
    alias_registries, build_nodes, build_repair_state, ngram_index_df,
    nodes_to_spark)
from address_parser_spark.operators.parse import resolve_mentions

cores = {cores}
strategy = {strategy!r}
spark = get_spark("strategy-bench", master=f"local[{{cores}}]")
spark.sparkContext.setLogLevel("ERROR")
gaz = synth_gazetteer()
nodes = build_nodes(gaz)
nodes_df = nodes_to_spark(spark, nodes)
index_df = ngram_index_df(nodes_df)
registries = alias_registries(gaz)
repair_state = build_repair_state(gaz, nodes)

def job(pages):
    resolve_mentions(
        pages, nodes_df, index_df, registries, strategy=strategy,
        nodes=nodes, repair_state=repair_state,
    ).write.format("noop").mode("overwrite").save()

job(spark.read.parquet({warm!r}))  # warm-up, full shape
pages = spark.read.parquet({corpus!r})
start = time.monotonic()
job(pages)
elapsed = time.monotonic() - start
print(json.dumps({{"strategy": strategy, "cores": cores, "pages": {n_pages},
                   "sec": round(elapsed, 2),
                   "pages_per_sec": round({n_pages} / elapsed, 2)}}))
spark.stop()
"""


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    with tempfile.TemporaryDirectory(prefix="strategy_bench_") as tmp:
        corpus, warm = f"{tmp}/pages", f"{tmp}/warm"
        subprocess.run(
            [sys.executable, "-c", _GEN_SNIPPET.format(
                repo=str(REPO), n_pages=n_pages, corpus=corpus,
                warm=warm, warm_pages=max(n_pages // 16, 256))],
            check=True, capture_output=True, text=True, timeout=6000,
        )

        raw: dict[str, list[dict]] = {"broadcast": [], "relational": []}
        pin = ["taskset", "-c", f"0-{cores - 1}"]
        for _ in range(reps):
            for strategy in ("broadcast", "relational"):
                out = subprocess.run(
                    pin + [sys.executable, "-c", _RUN_SNIPPET.format(
                        repo=str(REPO), cores=cores, strategy=strategy,
                        corpus=corpus, warm=warm, n_pages=n_pages)],
                    capture_output=True, text=True, timeout=6000,
                )
                lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
                if not lines:
                    raise RuntimeError(f"{strategy} run failed:\n{out.stderr[-2000:]}")
                raw[strategy].append(json.loads(lines[-1]))

    best = {s: max(v, key=lambda r: r["pages_per_sec"]) for s, v in raw.items()}
    print(json.dumps({
        "job": "resolve_strategy_trade",
        "pages": n_pages,
        "cores": cores,
        "broadcast": best["broadcast"],
        "relational": best["relational"],
        "all_reps": {k: [r["pages_per_sec"] for r in v] for k, v in raw.items()},
        "gap_x": round(
            best["broadcast"]["pages_per_sec"] / best["relational"]["pages_per_sec"], 2
        ),
    }))


if __name__ == "__main__":
    main()
