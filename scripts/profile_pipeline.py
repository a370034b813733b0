"""Per-stage wall-time profile of the ER pipeline at one parallelism level.

Diagnostic companion to scaling_bench.py: materializes each pipeline stage
separately and prints a JSON line of stage timings, so the serial-fraction
analysis (which stage stops scaling from N to 4N cores?) is measured, not
guessed.

Usage: python scripts/profile_pipeline.py <corpus_parquet> <cores>
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    corpus = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from address_parser_spark.gazetteer import synth_gazetteer
    from address_parser_spark.gazetteer.nodes import (
        alias_registries,
        build_nodes,
        ngram_index_df,
        nodes_to_spark,
    )
    from address_parser_spark.operators.cluster import cluster_mentions
    from address_parser_spark.operators.pairs import (
        candidate_pairs,
        match_edges,
        score_pairs,
        with_blocking_keys,
    )
    from address_parser_spark.operators.parse import (
        attach_street,
        block_candidates,
        extract_normalize,
        pick_winners,
        score_candidates,
    )
    from address_parser_spark.session import get_spark

    spark = get_spark("profile", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def mark(name: str, start: float) -> None:
        timings[name] = round(time.monotonic() - start, 2)

    t0 = time.monotonic()
    gaz = synth_gazetteer()
    nodes = build_nodes(gaz)
    nodes_df = nodes_to_spark(spark, nodes)
    index_df = ngram_index_df(nodes_df)
    registries = alias_registries(gaz)
    mark("gazetteer_prep", t0)

    t0 = time.monotonic()
    pages = spark.read.parquet(corpus)
    n_pages = pages.count()
    mark("scan_count", t0)

    t0 = time.monotonic()
    mentions = extract_normalize(pages, registries).localCheckpoint(eager=True)
    mark("extract_normalize", t0)

    t0 = time.monotonic()
    uniq = (
        mentions.dropDuplicates(["mention"])
        .select(F.xxhash64("mention").alias("mid"), "mention", "std", "det", "grams", "n_in")
        .localCheckpoint(eager=True)
    )
    mark("distinct_mentions", t0)

    t0 = time.monotonic()
    cands = block_candidates(uniq, index_df).localCheckpoint(eager=True)
    mark("block_candidates", t0)

    t0 = time.monotonic()
    scored = score_candidates(cands, uniq, nodes_df)
    winners = attach_street(pick_winners(scored)).drop("mid").localCheckpoint(eager=True)
    mark("score_argmax_street", t0)

    t0 = time.monotonic()
    resolved = (
        mentions.select("mid", "url", "mention").join(winners, "mention")
        .localCheckpoint(eager=True)
    )
    mark("fact_join", t0)

    t0 = time.monotonic()
    keyed = with_blocking_keys(resolved).localCheckpoint(eager=True)
    mark("blocking_keys", t0)

    t0 = time.monotonic()
    edges = match_edges(score_pairs(candidate_pairs(keyed, max_block=64)))
    edges.write.format("noop").mode("overwrite").save()
    mark("pair_stage", t0)

    t0 = time.monotonic()
    clustered = cluster_mentions(resolved, extra_edges=edges)
    clustered.write.format("noop").mode("overwrite").save()
    mark("clustering", t0)

    total = sum(timings.values())
    print(json.dumps({
        "cores": cores,
        "pages": n_pages,
        "stages": timings,
        "total_sec": round(total, 2),
        "pages_per_sec": round(n_pages / total, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
