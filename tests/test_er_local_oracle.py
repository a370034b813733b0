"""Driver-side oracle for the flagship ER pipeline (VERDICT r2 gap #5,
r3 gap #4).

``er_resolve_pages`` has no SQL oracle (the normalization/repair cascade is
an ordered replacement program), so its check is this three-way agreement:

1. live local oracle (``plans.er_oracle``: LocalParser + union-find) ==
   the COMMITTED fixture ``tests/fixtures/er_expected_120.json`` (sha256
   over the canonical serialization — regenerate with
   ``scripts/gen_er_expected.py`` when renderer/parser semantics change);
2. the distributed pipeline reproduces the fixture's rows + components;
3. the pipeline's cluster PARTITION equals the fixture's, under more than
   one input partitioning (cluster ids are implementation-defined; the
   grouping is the contract).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from address_parser_spark.plans.er_oracle import expected_to_canonical, local_er_expected

N_PAGES = 120
FIXTURE = Path(__file__).resolve().parent / "fixtures" / f"er_expected_{N_PAGES}.json"
FIXTURE_JSONL = FIXTURE.with_name(f"er_expected_{N_PAGES}_rows.jsonl")


@pytest.fixture(scope="module")
def committed():
    return json.loads(FIXTURE.read_text(encoding="utf-8"))


@pytest.fixture(scope="module")
def committed_driver_rows():
    return [
        json.loads(line)
        for line in FIXTURE_JSONL.read_text(encoding="utf-8").splitlines()
        if line
    ]


@pytest.fixture(scope="module")
def local_expected():
    from address_parser_spark.gazetteer import synth_gazetteer

    return local_er_expected(synth_gazetteer(), N_PAGES)


def test_local_oracle_matches_committed_fixture(local_expected, committed):
    rows, partition = local_expected
    doc = expected_to_canonical(rows, partition)
    assert doc["n_rows"] == committed["n_rows"]
    assert doc["sha256"] == committed["sha256"], (
        "live oracle diverged from the committed fixture — if the renderer "
        "or parser semantics changed intentionally, regenerate with "
        "scripts/gen_er_expected.py"
    )


def test_driver_jsonl_fixture_consistent_with_canonical(
    local_expected, committed, committed_driver_rows
):
    """The DuckDB-oracle JSONL (driver row shape: +std, cluster_id →
    cluster_rep) is the same frozen output as the canonical fixture."""
    from address_parser_spark.plans.er_oracle import expected_to_driver_rows

    rows, partition = local_expected
    assert expected_to_driver_rows(rows, partition) == committed_driver_rows
    # same row set as the canonical fixture, same cluster partition
    assert {(r["url"], r["mention"]) for r in committed_driver_rows} == {
        (r[0], r[1]) for r in committed["rows"]
    }
    by_rep: dict = {}
    for r in committed_driver_rows:
        by_rep.setdefault(r["cluster_rep"], set()).add((r["url"], r["mention"]))
    assert {frozenset(v) for v in by_rep.values()} == {
        frozenset(tuple(m) for m in cluster) for cluster in committed["partition"]
    }
    # every rep is the least member of its own cluster
    for rep, members in by_rep.items():
        assert rep == min(f"{u}\n{m}" for u, m in members)


@pytest.mark.slow
def test_driver_query_equals_jsonl_fixture(spark, committed_driver_rows):
    """Exactly what the driver compares: q_er_resolve_pages output ==
    the committed JSONL oracle, all ten columns, value-exact."""
    import __spark_entry__ as entrymod

    got = sorted(
        (r.asDict() for r in entrymod.q_er_resolve_pages(spark, "unused").collect()),
        key=lambda r: (r["url"], r["mention"]),
    )
    assert got == committed_driver_rows


@pytest.mark.slow
@pytest.mark.parametrize("partitions", [8, 3])
def test_er_resolve_pages_matches_fixture(spark, committed, partitions):
    from pyspark.sql import functions as F  # noqa: F401

    from address_parser_spark.gazetteer import synth_gazetteer
    from address_parser_spark.plans.pipeline import run_pipeline
    from address_parser_spark.sources.pages import synth_pages_spark

    expected_rows = {
        (r[0], r[1]): dict(
            zip(("province", "district", "ward", "street_address", "format", "entity_key"),
                r[2:])
        )
        for r in committed["rows"]
    }
    expected_partition = {
        frozenset(tuple(m) for m in cluster) for cluster in committed["partition"]
    }

    gaz = synth_gazetteer()
    pages = synth_pages_spark(spark, gaz, N_PAGES, partitions=partitions)
    clustered = run_pipeline(spark, pages, gaz)
    got = clustered.select(
        "url", "mention", "province", "district", "ward",
        "street_address", "format", "entity_key", "cluster_id",
    ).collect()

    # 1. row set + per-mention components match the committed parse exactly
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

    # 2. the cluster PARTITION matches, regardless of input partitioning
    spark_clusters: dict = {}
    for r in got:
        spark_clusters.setdefault(r["cluster_id"], set()).add((r["url"], r["mention"]))
    assert {frozenset(v) for v in spark_clusters.values()} == expected_partition
