"""Gazetteer explosion into match-candidate nodes (the engine's "dimension").

Re-creates the *semantics* of the reference's AddressNode explosion
(``fuzz/inexus_parser.py:13-36, 519-889``): every non-empty combination of
(province, district, ward) becomes one candidate node — P, D, PD, W, DW, PDW
for the 3-level old format and P, W, PW for the 2-level new format. Each node
carries

- ``std_name``: the blocking/scoring string = ``standardize_name`` of the
  primary aliases joined in **ward district province** order
  (reference ``_build_node_search_profile``),
- ``ngrams``: the union of padded char-4-gram shingles over the alias
  cross-product (the inverted-index postings),
- alias lists per level, with digit names augmented to typed spoken forms
  (``"1"`` → ``phuong 1 / p 1 / ward 1 / w 1``; reference ``_augment_aliases``
  ``:1855-1898``).

The build is driver-side pure Python: the catalog is a broadcast-sized
dimension (≈38.7k nodes for the full national data), so distributing its
construction would only add a shuffle for nothing. At web scale the OUTPUT is
what matters, and it ships to executors as a broadcast DataFrame.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from address_parser_spark.gazetteer.synth import Gazetteer
from address_parser_spark.textops.ngrams import char_ngrams
from address_parser_spark.textops.normalize import normalize_basic

NODE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("level", T.StringType(), False),
        T.StructField("is_new", T.BooleanType(), False),
        T.StructField("province", T.StringType(), True),
        T.StructField("district", T.StringType(), True),
        T.StructField("ward", T.StringType(), True),
        T.StructField("province_code", T.StringType(), True),
        T.StructField("district_code", T.StringType(), True),
        T.StructField("ward_code", T.StringType(), True),
        T.StructField("p_std", T.StringType(), True),
        T.StructField("d_std", T.StringType(), True),
        T.StructField("w_std", T.StringType(), True),
        T.StructField("std_name", T.StringType(), False),
        T.StructField("ngrams", T.ArrayType(T.StringType(), False), False),
    ]
)


def _augment_aliases(name: str, level: str) -> list[str]:
    """Primary alias plus typed spoken forms for bare-digit names."""
    aliases = [name]
    std = normalize_basic(name)
    if std.isdigit():
        if level == "ward":
            aliases += [f"phuong {std}", f"p {std}", f"ward {std}", f"w {std}"]
        elif level == "district":
            aliases += [f"quan {std}", f"q {std}", f"district {std}", f"d {std}"]
    return aliases


def _profile(
    province_aliases: list[str],
    district_aliases: list[str],
    ward_aliases: list[str],
) -> tuple[str, list[str]]:
    """(std_name, sorted distinct ngrams) for one node; empty alias list means
    the level is excluded. Mirrors ``_build_node_search_profile`` ordering:
    ward, district, province."""
    primary = " ".join(
        part[0] for part in (ward_aliases, district_aliases, province_aliases) if part
    )
    std_name = normalize_basic(primary)
    grams: set[str] = set()
    for w in ward_aliases or [""]:
        for d in district_aliases or [""]:
            for p in province_aliases or [""]:
                combined = " ".join(x for x in (w, d, p) if x)
                if not combined:
                    continue
                std = normalize_basic(combined)
                if std:
                    grams.update(char_ngrams(std))
    if not grams and std_name:
        grams.update(char_ngrams(std_name))
    return std_name, sorted(grams)


def build_nodes(gaz: Gazetteer) -> list[dict]:
    """Explode the catalog into match nodes (list of NODE_SCHEMA-shaped dicts)."""
    nodes: list[dict] = []

    def add(level, is_new, province, district, ward, p_code, d_code, w_code,
            p_aliases, d_aliases, w_aliases):
        std_name, grams = _profile(p_aliases, d_aliases, w_aliases)
        if not std_name:
            return
        nodes.append(
            {
                "node_id": len(nodes),
                "level": level,
                "is_new": is_new,
                "province": province or None,
                "district": district or None,
                "ward": ward or None,
                "province_code": p_code,
                "district_code": d_code,
                "ward_code": w_code,
                "p_std": normalize_basic(province) if province else None,
                "d_std": normalize_basic(district) if district else None,
                "w_std": normalize_basic(ward) if ward else None,
                "std_name": std_name,
                "ngrams": grams,
            }
        )

    # ---- old format: 3 levels → P, D, PD, W, DW, PDW ----
    districts_by_province: dict[str, list[dict]] = {}
    for d in gaz.old_districts:
        districts_by_province.setdefault(d["province_code"], []).append(d)
    wards_by_district: dict[str, list[dict]] = {}
    for w in gaz.old_wards:
        wards_by_district.setdefault(w["district_code"], []).append(w)

    for p in gaz.old_provinces:
        p_al = _augment_aliases(p["name"], "province")
        add("P", False, p["name"], "", "", p["code"], None, None, p_al, [], [])
        for d in districts_by_province.get(p["code"], []):
            d_al = _augment_aliases(d["name"], "district")
            add("D", False, "", d["name"], "", p["code"], d["code"], None, [], d_al, [])
            add("PD", False, p["name"], d["name"], "", p["code"], d["code"], None, p_al, d_al, [])
            for w in wards_by_district.get(d["code"], []):
                w_al = _augment_aliases(w["name"], "ward")
                add("W", False, "", "", w["name"], p["code"], d["code"], w["code"], [], [], w_al)
                add("DW", False, "", d["name"], w["name"], p["code"], d["code"], w["code"], [], d_al, w_al)
                add("PDW", False, p["name"], d["name"], w["name"], p["code"], d["code"], w["code"], p_al, d_al, w_al)

    # ---- new format: 2 levels → P, W, PW ----
    new_wards_by_province: dict[str, list[dict]] = {}
    for w in gaz.new_wards:
        new_wards_by_province.setdefault(w["province_code"], []).append(w)

    for p in gaz.new_provinces:
        p_al = _augment_aliases(p["name"], "province")
        add("NP", True, p["name"], "", "", p["code"], None, None, p_al, [], [])
        for w in new_wards_by_province.get(p["code"], []):
            w_al = _augment_aliases(w["name"], "ward")
            add("NW", True, "", "", w["name"], p["code"], None, w["code"], [], [], w_al)
            add("NPW", True, p["name"], "", w["name"], p["code"], None, w["code"], p_al, [], w_al)

    return nodes


def nodes_to_spark(spark: SparkSession, nodes: Iterable[dict]) -> DataFrame:
    """Materialize nodes as a DataFrame with the explicit NODE_SCHEMA."""
    rows = [
        (
            n["node_id"], n["level"], n["is_new"], n["province"], n["district"],
            n["ward"], n["province_code"], n["district_code"], n["ward_code"],
            n["p_std"], n["d_std"], n["w_std"], n["std_name"], n["ngrams"],
        )
        for n in nodes
    ]
    return spark.createDataFrame(rows, NODE_SCHEMA)


def alias_registries(gaz: Gazetteer) -> dict[str, list[str]]:
    """Standardized alias registries per level for prefix detection
    (reference ``province_names_std`` / ``district_names_std`` /
    ``ward_names_std``, inexus_parser.py:99-102). Sorted for determinism."""
    provinces: set[str] = set()
    districts: set[str] = set()
    wards: set[str] = set()
    for rec in list(gaz.old_provinces) + list(gaz.new_provinces):
        for alias in _augment_aliases(rec["name"], "province"):
            std = normalize_basic(alias)
            if std:
                provinces.add(std)
    for rec in gaz.old_districts:
        for alias in _augment_aliases(rec["name"], "district"):
            std = normalize_basic(alias)
            if std:
                districts.add(std)
    for rec in list(gaz.old_wards) + list(gaz.new_wards):
        for alias in _augment_aliases(rec["name"], "ward"):
            std = normalize_basic(alias)
            if std:
                wards.add(std)
    return {
        "province": sorted(provinces),
        "district": sorted(districts),
        "ward": sorted(wards),
    }


INDEX_SCHEMA = "g string, node_id long, n_primary int, is_primary boolean"


def ngram_index_df(nodes_df: DataFrame) -> DataFrame:
    """Inverted postings derived IN SPARK from the nodes DataFrame.

    Same contract as ``ngram_index`` (alias-union postings flagged by
    primary-form membership) but built with JVM columns — shipping a
    driver-materialized posting list through ``createDataFrame`` costs tens of
    seconds per job at 32 slices; deriving it from the (tiny) nodes frame is
    free and broadcast-joins identically. The JVM n-gram builder
    (``functions.columns.char_ngrams_col``) is byte-compatible with
    ``textops.char_ngrams``.
    """
    from pyspark.sql import functions as F

    from address_parser_spark.functions.columns import char_ngrams_col

    primary = char_ngrams_col(F.col("std_name"))
    return (
        nodes_df
        .withColumn("primary_grams", primary)
        .select(
            "node_id",
            F.size("primary_grams").alias("n_primary"),
            "primary_grams",
            F.explode("ngrams").alias("g"),
        )
        .select(
            "g", "node_id", "n_primary",
            F.array_contains("primary_grams", F.col("g")).alias("is_primary"),
        )
    )


def ngram_index(nodes: Iterable[dict]) -> list[tuple[str, int, int, bool]]:
    """Inverted postings ``(ngram, node_id, n_primary, is_primary)``.

    Postings span the full alias-union gram set (recall: any typed/spoken
    variant can retrieve the node), but each posting is flagged whether the
    gram belongs to the node's PRIMARY form (``std_name``). The Dice gate is
    computed over primary grams only — alias unions (esp. digit wards with
    ``phuong X / p X / ward X / w X`` forms) would otherwise dilute the
    denominator and gate out exact matches. ``n_primary`` rides along so the
    gate needs no second join.
    """
    from address_parser_spark.textops.ngrams import char_ngram_set

    postings: list[tuple[str, int, int, bool]] = []
    for n in nodes:
        primary = char_ngram_set(n["std_name"])
        n_primary = len(primary)
        for g in n["ngrams"]:
            postings.append((g, n["node_id"], n_primary, g in primary))
    return postings
