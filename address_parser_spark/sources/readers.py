"""File readers/sinks mirroring the reference's scan surface (SURVEY §2.1).

| ref | here |
|---|---|
| S1 JSON gazetteer scan (``_read_json_file``) | ``read_gazetteer_dir`` — schema'd ``spark.read.json`` per catalog file |
| S2 JSON-array streaming scan (brace-depth parser) | ``read_json_auto`` — Spark's reader already splits/streams; multiLine for arrays |
| S3 JSONL line scan | ``read_jsonl`` |
| S4 reference-name text scan | ``read_name_list`` — one name per line + normalized column |
| S5 JSONL sink | ``write_jsonl`` |

The reference hand-rolled an incremental array parser to keep 3M rows out of
RAM (ner/build_real_dataset.py:60-103); Spark's JSON source gets the same
constant-memory behavior from splittable line-delimited input for free, and
``multiLine=true`` covers whole-array files (non-splittable — documented
trade-off, same as the reference's "memory" mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from address_parser_spark.functions.udfs import normalize_basic_udf

ADMIN_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("code", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("name_en", T.StringType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("full_name_en", T.StringType()),
        T.StructField("code_name", T.StringType()),
        T.StructField("province_code", T.StringType()),
        T.StructField("district_code", T.StringType()),
        T.StructField("administrative_unit_id", T.IntegerType()),
    ]
)

GAZETTEER_FILES = {
    "old_provinces": "old_provinces.json",
    "old_districts": "old_districts.json",
    "old_wards": "old_wards.json",
    "new_provinces": "provinces.json",
    "new_wards": "wards.json",
}


def read_json_auto(spark: SparkSession, path: str, multiline: bool = False) -> DataFrame:
    """S2: JSON scan — line-delimited by default (splittable, constant
    memory); ``multiline=True`` for whole-array files."""
    return spark.read.option("multiLine", multiline).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S3: JSONL scan with optional explicit schema (skip inference pass)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: JSONL sink."""
    df.write.mode(mode).json(path)


def read_name_list(spark: SparkSession, path: str) -> DataFrame:
    """S4: one name per line → (name, name_std)."""
    return (
        spark.read.text(path)
        .select(F.trim("value").alias("name"))
        .filter(F.length("name") > 0)
        .withColumn("name_std", normalize_basic_udf(F.col("name")))
    )


def read_gazetteer_dir(spark: SparkSession, data_dir: str) -> dict[str, DataFrame]:
    """S1: load a reference-shaped gazetteer directory (``fuzz/data`` layout)
    into schema'd DataFrames keyed by logical table name."""
    out: dict[str, DataFrame] = {}
    for table, filename in GAZETTEER_FILES.items():
        out[table] = (
            spark.read.schema(ADMIN_RECORD_SCHEMA)
            .option("multiLine", True)
            .json(f"{data_dir}/{filename}")
        )
    return out


def gazetteer_from_dir(spark: SparkSession, data_dir: str):
    """S1 end-to-end: reference-shaped gazetteer directory → in-memory
    ``Gazetteer`` catalog (the dimension is ≤ tens of thousands of rows —
    collected once on the driver, then broadcast by the pipeline's node/index
    builders). ``ward_mappings.json`` is optional."""
    import os

    from address_parser_spark.gazetteer.synth import Gazetteer

    dfs = read_gazetteer_dir(spark, data_dir)
    gaz = Gazetteer(
        old_provinces=[r.asDict() for r in dfs["old_provinces"].collect()],
        old_districts=[r.asDict() for r in dfs["old_districts"].collect()],
        old_wards=[r.asDict() for r in dfs["old_wards"].collect()],
        new_provinces=[r.asDict() for r in dfs["new_provinces"].collect()],
        new_wards=[r.asDict() for r in dfs["new_wards"].collect()],
    )
    mapping_path = f"{data_dir}/ward_mappings.json"
    if os.path.exists(mapping_path):
        rows = spark.read.option("multiLine", True).json(mapping_path).collect()
        gaz.ward_mappings = [r.asDict() for r in rows]
    return gaz
