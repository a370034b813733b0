"""Connected-components unit tests on hand-built graphs (SURVEY §5 plan)."""

import pytest

from address_parser_spark.operators.cluster import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df).collect()
    comp: dict[int, int] = {r["id"]: r["component"] for r in rows}
    return comp


def test_chain(spark):
    comp = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert all(comp[i] == 1 for i in (1, 2, 3, 4, 5))


def test_star(spark):
    comp = _cc(spark, [(10, 1), (10, 2), (10, 3), (10, 4)])
    assert all(comp[i] == 1 for i in (1, 2, 3, 4, 10))


def test_two_components(spark):
    comp = _cc(spark, [(1, 2), (2, 3), (10, 11), (11, 12)])
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == comp[12] == 10
    assert comp[1] != comp[10]


def test_self_loop_and_duplicates(spark):
    comp = _cc(spark, [(7, 7), (7, 8), (8, 7), (7, 8)])
    assert comp[7] == comp[8] == 7


def test_long_path_converges_logarithmically(spark):
    n = 64
    comp = _cc(spark, [(i, i + 1) for i in range(n)])
    assert all(comp[i] == 0 for i in range(n + 1))
