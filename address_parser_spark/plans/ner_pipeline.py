"""Bulk NER-dataset pipeline — the reference's own web-scale story
(``ner/build_real_dataset.py:159-247``, SURVEY §3.2), distributed.

raw mentions → resolve (full parse pipeline) → completeness filter (P3:
province+district+ward for old format, province+ward for new) → BIO labeling
(F15) → all-components-matched filter (P4) → deterministic hash split (W6,
replacing the reference's seeded Bernoulli with a partition-invariant
``xxhash64 % N`` rule) → JSONL-ready records
``{id, text, tokens, ner_tags, source}``.

Embarrassingly parallel after resolution — zero additional shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_LABEL_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("ner_tags", T.ArrayType(T.StringType())),
        T.StructField("street_m", T.BooleanType()),
        T.StructField("ward_m", T.BooleanType()),
        T.StructField("district_m", T.BooleanType()),
        T.StructField("province_m", T.BooleanType()),
    ]
)


@pandas_udf(_LABEL_SCHEMA)
def bio_label_udf(
    mention: pd.Series, street: pd.Series, province: pd.Series,
    district: pd.Series, ward: pd.Series,
) -> pd.DataFrame:
    from address_parser_spark.textops.bio import label_tokens

    rows = []
    for m, s, p, d, w in zip(mention, street, province, district, ward):
        res = label_tokens(
            m if isinstance(m, str) else "",
            street=s if isinstance(s, str) and s else None,
            province=p if isinstance(p, str) else None,
            district=d if isinstance(d, str) else None,
            ward=w if isinstance(w, str) else None,
        )
        rows.append(
            (
                res["tokens"], res["ner_tags"],
                res["matches"]["STREET"], res["matches"]["WARD"],
                res["matches"]["DISTRICT"], res["matches"]["PROVINCE"],
            )
        )
    return pd.DataFrame(rows, columns=["tokens", "ner_tags", "street_m", "ward_m", "district_m", "province_m"])


def build_ner_dataset(resolved: DataFrame, train_fraction: int = 9) -> tuple[DataFrame, DataFrame]:
    """resolved mentions → (train, test) BIO-labeled records.

    ``train_fraction`` of 10 hash buckets go to train (reference default
    train_ratio 0.9, build_real_dataset.py:227-231 — made deterministic and
    partition-invariant via xxhash64 of the mention key).
    """
    complete = resolved.filter(
        F.col("province").isNotNull()
        & F.col("ward").isNotNull()
        & (F.col("is_new") | F.col("district").isNotNull())
    )
    labeled = complete.withColumn(
        "bio",
        bio_label_udf(
            F.col("mention"), F.col("street_address"),
            F.col("province"), F.col("district"), F.col("ward"),
        ),
    )
    # P4: every present component must have matched a token window.
    good = labeled.filter(
        F.col("bio.ward_m") & F.col("bio.province_m")
        & (F.col("is_new") | F.col("bio.district_m"))
    )
    records = good.select(
        F.concat_ws("_", F.lit("real"), F.col("mid").cast("string")).alias("id"),
        F.col("mention").alias("text"),
        F.col("bio.tokens").alias("tokens"),
        F.col("bio.ner_tags").alias("ner_tags"),
        F.col("format").alias("source"),
        F.pmod(F.xxhash64("url", "mention"), F.lit(10)).alias("bucket"),
    )
    train = records.filter(F.col("bucket") < train_fraction).drop("bucket")
    test = records.filter(F.col("bucket") >= train_fraction).drop("bucket")
    return train, test
