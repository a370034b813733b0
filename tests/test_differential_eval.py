"""Differential-eval harness (reference tests/eval_parsers.py:42-114):
result-shape adapters + per-field mismatch surface vs an external baseline.
"""

from __future__ import annotations

import pytest

from address_parser_spark.operators.eval import (
    adapt_result_cols,
    diff_counts,
    differential_eval,
)

PARSED_SCHEMA = (
    "address string, province string, district string, ward string, "
    "street_address string, format string, is_new boolean"
)
BASE_SCHEMA = (
    "address string, ctryname string, ctrysubdivname string, "
    "ctrysubsubdivname array<string>"
)


@pytest.fixture()
def parsed(spark):
    return spark.createDataFrame(
        [
            # old format: subdiv = district, subsubdiv = [street, ward]
            ("a1", "Hồ Chí Minh", "Quận 5", "Phường 12", "99 Lê Lợi", "old", False),
            # new format: subdiv = ward, subsubdiv = [street]
            ("a2", "Đà Nẵng", None, "Xuân Mỹ", "28 Hoàng Văn Thụ", "new", True),
            # unresolved street (empty array slot dropped)
            ("a3", "Hà Nội", "Thạch Thất", "Bình Yên", None, "old", False),
            # parser-only key (no baseline analog — key-normalization drift):
            # must surface as extra_parse, not silently vanish
            ("a5", "Huế", "Phú Vang", "Phú Mỹ", "3 Lê Duẩn", "old", False),
        ],
        PARSED_SCHEMA,
    )


def test_adapt_result_cols_shapes(parsed):
    rows = {r["address"]: r for r in adapt_result_cols(parsed).collect()}
    a1 = rows["a1"]
    assert a1["ctryname"] == "hồ chí minh"
    assert a1["ctrysubdivname"] == "quận 5"
    assert a1["ctrysubsubdivname"] == ["99 lê lợi", "phường 12"]
    a2 = rows["a2"]
    assert a2["ctrysubdivname"] == "xuân mỹ"
    assert a2["ctrysubsubdivname"] == ["28 hoàng văn thụ"]
    a3 = rows["a3"]
    assert a3["ctrysubsubdivname"] == ["bình yên"]


def test_differential_eval_counts_and_dump(spark, parsed):
    baseline = spark.createDataFrame(
        [
            # exact agreement (baseline normalization differs only by case)
            ("a1", "HỒ CHÍ MINH", "Quận 5", ["99 lê lợi", "phường 12"]),
            # subdiv mismatch
            ("a2", "đà nẵng", "hòa giang", ["28 hoàng văn thụ"]),
            # subsubdiv mismatch (baseline kept a street we dropped)
            ("a3", "hà nội", "thạch thất", ["5 abc", "bình yên"]),
            # baseline-only row: the parser never emitted a4 — the reference
            # charges every dataset row, so it must count as a full mismatch
            ("a4", "cần thơ", "ninh kiều", ["12 trần phú"]),
        ],
        BASE_SCHEMA,
    )
    diffed = differential_eval(parsed, baseline, key="address")
    counts = diff_counts(diffed)
    assert counts == {
        "total": 4,
        "ctryname": 1,
        "ctrysubdivname": 2,
        "ctrysubsubdivname": 2,
        "missing_parse": 1,
        "extra_parse": 1,
    }
    dump = {r["address"]: r for r in diffed.filter("any_diff").collect()}
    assert set(dump) == {"a2", "a3", "a4", "a5"}
    assert dump["a2"]["base_ctrysubdivname"] == "hòa giang"
    assert dump["a3"]["new_ctrysubsubdivname"] == ["bình yên"]
    assert dump["a4"]["missing_parse"] is True
    assert dump["a4"]["new_ctryname"] == ""
    assert dump["a5"]["extra_parse"] is True
    assert dump["a5"]["missing_parse"] is False
    assert dump["a5"]["base_ctryname"] == ""
