"""The two resolve_mentions strategies are one contract, two physical plans.

``broadcast`` (fused Arrow kernel over a broadcast catalog) and ``relational``
(blocking equi-join + JVM Dice gate + scoring UDF + max_by) must produce
IDENTICAL winners — resolve_mentions' docstring promises it, and the 100 TB
deployment story depends on it (the relational form is the fallback when the
catalog outgrows a broadcast). This file is that assertion, plus the unit pin
for the one known way they could drift: the reference nullifies detected
aliases missing from the invert map (``_validate_detected_value``,
inexus_parser.py:1900-1905) — the fused kernel and the repair UDF do this
internally, the relational scorer via operators.parse._validate_det_cols.
"""

import pytest
from pyspark.sql import functions as F

from address_parser_spark.gazetteer.nodes import (
    alias_registries,
    build_nodes,
    build_repair_state,
    ngram_index_df,
    nodes_to_spark,
)
from address_parser_spark.operators.parse import _validate_det_cols, resolve_mentions
from address_parser_spark.sources.pages import PAGES_SCHEMA, synth_pages_local

N_PAGES = 120


@pytest.fixture(scope="module")
def gaz_state(spark, gaz):
    nodes = build_nodes(gaz)
    nodes_df = nodes_to_spark(spark, nodes)
    return {
        "nodes": nodes,
        "nodes_df": nodes_df,
        "index_df": ngram_index_df(nodes_df),
        "registries": alias_registries(gaz),
        "repair_state": build_repair_state(gaz, nodes),
    }


def _run(spark, gaz, gaz_state, strategy):
    pages, _ = synth_pages_local(gaz, N_PAGES)
    pages_df = spark.createDataFrame(pages, PAGES_SCHEMA)
    return resolve_mentions(
        pages_df,
        gaz_state["nodes_df"],
        gaz_state["index_df"],
        gaz_state["registries"],
        strategy=strategy,
        nodes=gaz_state["nodes"],
        repair_state=gaz_state["repair_state"],
    )


def test_strategies_produce_identical_winners(spark, gaz, gaz_state):
    broadcast = _run(spark, gaz, gaz_state, "broadcast")
    relational = _run(spark, gaz, gaz_state, "relational")

    cols = sorted(set(broadcast.columns) & set(relational.columns))
    assert {"url", "mention", "province", "district", "ward",
            "province_code", "district_code", "ward_code",
            "street_address", "entity_key"} <= set(cols)

    def rows(df):
        return sorted(
            (tuple(r) for r in df.select(*cols).collect()),
            key=lambda t: tuple((v is None, str(v)) for v in t),
        )

    b, r = rows(broadcast), rows(relational)
    assert len(b) == len(r) > 0
    mismatches = [(x, y) for x, y in zip(b, r) if x != y]
    assert not mismatches, f"{len(mismatches)} diverging rows; first: {mismatches[0]}"


def test_validate_det_cols_nullifies_unregistered_aliases(spark):
    inv = {
        "province": {"ha noi": [1]},
        "district": {"dong da": [2]},
        "ward": {},
    }
    df = spark.createDataFrame(
        [
            (1, "ha noi", "dong da", "lang ha"),     # ward alias unregistered
            (2, "ha noi", "hoan kiem", None),        # district alias unregistered
            (3, "hue", None, None),                  # province alias unregistered
            (4, None, None, None),                   # nothing detected
        ],
        "mid long, det_p string, det_d string, det_w string",
    )
    got = {
        r["mid"]: (r["det_p"], r["det_d"], r["det_w"])
        for r in _validate_det_cols(df, inv).collect()
    }
    assert got == {
        1: ("ha noi", "dong da", None),
        2: ("ha noi", None, None),
        3: (None, None, None),
        4: (None, None, None),
    }
    # row multiplicity preserved (left joins cannot fan out on unique keys)
    assert len(got) == 4
