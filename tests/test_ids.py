"""ID-surface lookups (operators.ids) — reference parity for
get_address_components_from_ids / map_address_ids (inexus_parser.py:1579,1613)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dims(gaz):
    old_d = {d["code"]: d for d in gaz.old_districts}
    old_p = {p["code"]: p for p in gaz.old_provinces}
    return old_d, old_p


def test_components_from_codes_old_and_new(spark, gaz, dims):
    from address_parser_spark.operators.ids import components_from_codes

    old_d, old_p = dims
    w = gaz.old_wards[7]
    d = old_d[w["district_code"]]
    p = old_p[d["province_code"]]
    nw = gaz.new_wards[3]
    np_ = next(x for x in gaz.new_provinces if x["code"] == nw["province_code"])

    records = spark.createDataFrame(
        [
            (p["code"], d["code"], w["code"], False),
            (np_["code"], None, nw["code"], True),
            (None, None, "nonexistent", False),
        ],
        "province_code string, district_code string, ward_code string, is_new boolean",
    )
    rows = {r["ward_code"]: r for r in components_from_codes(records, gaz).collect()}

    old_row = rows[w["code"]]
    assert old_row["province_name"] == p["name"]
    assert old_row["district_name"] == d["name"]
    assert old_row["ward_name"] == w["name"]
    assert old_row["full_address"] == f'{w["full_name"]}, {d["full_name"]}, {p["full_name"]}'

    new_row = rows[nw["code"]]
    assert new_row["province_name"] == np_["name"]
    assert new_row["district_name"] is None
    assert new_row["ward_name"] == nw["name"]
    assert new_row["full_address"] == f'{nw["full_name"]}, {np_["full_name"]}'

    missing = rows["nonexistent"]
    assert missing["ward_name"] is None and missing["province_name"] is None


def test_map_address_codes_round_trip(spark, gaz, dims):
    from address_parser_spark.operators.ids import map_address_codes

    old_d, old_p = dims
    mapping = gaz.ward_mappings[0]
    old_code = mapping["old_ward_code"]
    w = next(x for x in gaz.old_wards if x["code"] == old_code)
    d = old_d[w["district_code"]]
    p = old_p[d["province_code"]]

    records = spark.createDataFrame(
        [(old_code, p["name"], d["name"])],
        "ward_code string, province_name string, district_name string",
    )
    out = map_address_codes(records, gaz, to_new=True).collect()[0]
    assert out["new_ward_code"] == mapping["new_ward_code"]
    assert out["target_ward_name"] is not None
    assert out["target_full_address"].endswith(mapping["new_province_name"])

    # reverse: the new ward maps back to SOME old ward of that group
    back = spark.createDataFrame(
        [(mapping["new_ward_code"], mapping["new_province_name"])],
        "ward_code string, province_name string",
    )
    rows = map_address_codes(back, gaz, to_new=False).collect()
    assert len(rows) == 1
    assert rows[0]["old_ward_code"] is not None
    assert rows[0]["target_full_address"]
