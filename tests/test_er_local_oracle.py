"""Driver-side oracle for the flagship ER pipeline (VERDICT r2 gap #5).

``er_resolve_pages`` has no SQL oracle (the normalization/repair cascade is
an ordered replacement program), so its driver check was rows-only. This
test gives it a REAL invariant: the whole distributed dataflow — extraction
explode, distinct-mention resolve, fact join, blocking keys, string edges,
connected components — must reproduce a straight-line local computation:

- per-(url, mention) components via ``LocalParser`` (the same pure functions
  the Arrow kernel runs — parity by construction for resolution, so any
  mismatch isolates a DISTRIBUTED-plumbing bug);
- clustering via a plain union-find over the same edge semantics: entity-key
  anchors (entity_std-salted when ward-less) plus identical-(canon, dsig)
  string edges.

Deterministic: same synthetic corpus seed, no dependence on partitioning.
"""

from __future__ import annotations

import pytest

N_PAGES = 120


def _role_dsig(fmt: str, district, ward, std: str) -> str:
    """Mirror pairs.with_blocking_keys digit_sig (role-tagged)."""
    if district is not None or ward is not None:
        return "|".join([fmt or "?", "r", district or "", ward or ""])
    digits = " ".join(t for t in std.split() if t.isdigit())
    return "|".join([fmt or "?", "u", digits])


def _canon(entity_std: str) -> str:
    return " ".join(sorted(set(entity_std.split())))


@pytest.fixture(scope="module")
def local_expected():
    from address_parser_spark.gazetteer import synth_gazetteer
    from address_parser_spark.plans.local_parser import LocalParser
    from address_parser_spark.sources.pages import synth_pages_local
    from address_parser_spark.textops.extract import extract_mentions
    from address_parser_spark.textops.normalize import normalize_advanced

    gaz = synth_gazetteer()
    lp = LocalParser(gaz)
    pages, _ = synth_pages_local(gaz, N_PAGES)

    rows = {}  # (url, mention) -> dict
    for url, _ts, _html, text, lang in pages:
        if lang != "vi":
            continue
        for mention in extract_mentions(text):
            std = normalize_advanced(mention)
            if len(std) < 2:
                continue
            key = (url, mention)
            if key in rows:
                continue
            out = lp.process(mention)
            if not (
                out["node_id"] is not None
                or out["province"] or out["district"] or out["ward"]
            ):
                continue
            fmt = out["format"]
            p = out["province"]["name"] if out["province"] else None
            d = out["district"]["name"] if out["district"] else None
            w = out["ward"]["name"] if out["ward"] else None
            p_c = out["province"]["code"] if out["province"] else None
            d_c = out["district"]["code"] if out["district"] else None
            w_c = out["ward"]["code"] if out["ward"] else None
            entity_key = "|".join(
                [
                    p_c or "",
                    "" if out["is_new"] is True else (d_c or ""),
                    w_c or "",
                    {True: "true", False: "false"}.get(out["is_new"], "unknown"),
                ]
            )
            rows[key] = {
                "province": p,
                "district": d,
                "ward": w,
                "street_address": out["street_address"],
                "format": fmt,
                "entity_key": entity_key,
                "entity_std": out["entity_std"],
                "ward_resolved": w is not None and w_c is not None,
                "std": std,
            }

    # Union-find clustering over anchor + string-identity edges.
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    by_string: dict = {}
    for key, r in rows.items():
        anchor = (
            ("ek", r["entity_key"])
            if r["ward_resolved"]
            else ("ek+std", r["entity_key"], r["entity_std"])
        )
        union(("m",) + key, anchor)
        sig = (_canon(r["entity_std"]), _role_dsig(r["format"], r["district"], r["ward"], r["std"]))
        by_string.setdefault(sig, []).append(key)
    for members in by_string.values():
        for other in members[1:]:
            union(("m",) + members[0], ("m",) + other)

    clusters: dict = {}
    for key in rows:
        clusters.setdefault(find(("m",) + key), set()).add(key)
    partition = {frozenset(v) for v in clusters.values()}
    return rows, partition


@pytest.mark.slow
def test_er_resolve_pages_matches_local_oracle(spark, local_expected):
    from pyspark.sql import functions as F

    from address_parser_spark.gazetteer import synth_gazetteer
    from address_parser_spark.plans.pipeline import run_pipeline
    from address_parser_spark.sources.pages import synth_pages_spark

    expected_rows, expected_partition = local_expected

    gaz = synth_gazetteer()
    pages = synth_pages_spark(spark, gaz, N_PAGES, partitions=8)
    clustered = run_pipeline(spark, pages, gaz)
    got = clustered.select(
        "url", "mention", "province", "district", "ward",
        "street_address", "format", "entity_key", "cluster_id",
    ).collect()

    # 1. row set + per-mention components match the local parse exactly
    got_keys = {(r["url"], r["mention"]) for r in got}
    assert got_keys == set(expected_rows), (
        f"row sets differ: {len(got_keys)} vs {len(expected_rows)}"
    )
    for r in got:
        exp = expected_rows[(r["url"], r["mention"])]
        for field in ("province", "district", "ward", "street_address",
                      "format", "entity_key"):
            assert r[field] == exp[field], (
                f"{field} mismatch for {r['url']}/{r['mention']}: "
                f"{r[field]!r} != {exp[field]!r}"
            )

    # 2. the cluster PARTITION matches the union-find oracle (ids are
    # implementation-defined; the grouping is the contract)
    spark_clusters: dict = {}
    for r in got:
        spark_clusters.setdefault(r["cluster_id"], set()).add((r["url"], r["mention"]))
    assert {frozenset(v) for v in spark_clusters.values()} == expected_partition
