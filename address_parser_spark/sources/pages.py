"""Deterministic synthetic Common-Crawl-style pages corpus.

Schema per ``BASELINE.json`` ``input_hint``:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``
plus a ground-truth sidecar ``gold_mentions(url, mention, province_code,
district_code, ward_code, is_new)`` — which gazetteer entity each embedded
mention denotes, enabling gold pair labels for the F1 gate (FIXTURES.md §1/§6).

Rendering follows the *shape* of the reference's variant templating
(``ner/build_standard_dataset.py:223-372``: accentless, abbreviated types,
dropped types, reordered components, glued forms, hamlet-clause noise) —
re-derived, not copied.

Generation is keyed purely on ``(seed, page_id)``, so the distributed
generator (``synth_pages_spark``: ``spark.range`` → ``mapInPandas``) produces
byte-identical rows under any partitioning or parallelism level — which is
what makes the two-parallelism scaling benchmark an apples-to-apples run.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from address_parser_spark.gazetteer.synth import Gazetteer
from address_parser_spark.textops.normalize import strip_accents

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

GOLD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("province_code", T.StringType(), True),
        T.StructField("district_code", T.StringType(), True),
        T.StructField("ward_code", T.StringType(), True),
        T.StructField("is_new", T.BooleanType(), False),
    ]
)

_STREETS = [
    "Nguyễn Trãi", "Lê Lợi", "Trần Hưng Đạo", "Điện Biên Phủ", "Cách Mạng Tháng Tám",
    "Hai Bà Trưng", "Lý Thường Kiệt", "Võ Văn Tần", "Phan Đình Phùng", "Hoàng Văn Thụ",
]
_FILLER_VI = [
    "Công ty chuyên cung cấp dịch vụ vận chuyển hàng hóa toàn quốc.",
    "Khách hàng vui lòng đặt lịch trước khi đến làm việc.",
    "Sản phẩm được bảo hành chính hãng trong 12 tháng.",
    "Chúng tôi phục vụ từ 8 giờ sáng đến 9 giờ tối hàng ngày.",
    "Đội ngũ nhân viên giàu kinh nghiệm luôn sẵn sàng hỗ trợ.",
    "Giá cả cạnh tranh, chất lượng hàng đầu thị trường.",
]
_FILLER_EN = [
    "We ship internationally with tracked delivery.",
    "Contact our support team for wholesale pricing.",
    "All products come with a one-year warranty.",
]
_TRIGGERS = ["Địa chỉ: ", "Địa chỉ liên hệ: ", "Trụ sở tại: ", "Văn phòng: ", "Chi nhánh: ", "Liên hệ tại: "]

_EPOCH = dt.datetime(2024, 1, 1)


def _type_word(rec: dict) -> str:
    return rec["full_name"][: -len(rec["name"])].strip() if rec["full_name"].endswith(rec["name"]) else ""


def _render_mention(
    rng: random.Random,
    ward: dict,
    district: dict | None,
    province: dict,
    unique_wd: frozenset | None = None,
) -> str:
    """One address mention in a random style; returns the exact text embedded."""
    w_name, p_name = ward["name"], province["name"]
    w_type, p_type = _type_word(ward), _type_word(province)
    street = rng.choice(_STREETS)
    house = rng.randint(1, 450)
    style = rng.randrange(11)
    if district is not None:
        d_name, d_type = district["name"], _type_word(district)
        # Partial style 10 omits the province — the repair cascade must infer
        # it back (reference process() step 6); only rendered when the
        # (ward, district) NAME PAIR is globally unique in the old catalog
        # (membership in ``unique_wd``, precomputed by _GazIndex) and
        # non-digit, so the gold entity stays recoverable and the F1 gate is
        # meaningful. (A no-district partial was tried and removed:
        # "Xã W, Tỉnh P" is string-identical to a new-format mention of the
        # post-merger twin ward — no string system can separate the two
        # entities.)
        if style >= 10 and (
            w_name.isdigit()
            or d_name.isdigit()
            or unique_wd is None
            or (w_name.lower(), d_name.lower()) not in unique_wd
        ):
            style = 0
        forms = {
            0: f"Số {house} {street}, {w_type} {w_name}, {d_type} {d_name}, {p_type} {p_name}",
            1: f"{house} {street}, {w_name}, {d_name}, {p_name}",
            2: f"{house}/{rng.randint(1,99)} {street}, P.{w_name}, Q.{d_name}, TP.{p_name}",
            3: f"{street}, {w_type} {w_name}, {d_type} {d_name}, {p_name}",
            4: f"{w_name} - {d_name} - {p_name}",
            5: f"Số {house} {street}, {w_type} {w_name}, {d_type} {d_name}, TP.{p_name.replace(' ', '')}",
            6: f"{p_type} {p_name}, {d_type} {d_name}, {w_type} {w_name}",
            7: f"khu phố {rng.randint(1,9)}, {w_type} {w_name}, {d_type} {d_name}, {p_type} {p_name}",
            8: f"số {house} đường {street}, {w_name}, {d_name}, {p_name}",
            9: f"{house} {street} {w_type} {w_name} {d_type} {d_name} {p_type} {p_name}",
            10: f"Số {house} {street}, {w_type} {w_name}, {d_type} {d_name}",
        }
    else:  # new 2-level format
        forms = {k: f"{w_type} {w_name}, {p_type} {p_name}" for k in range(11)}
        forms[1] = f"Số {house} {street}, {w_name}, {p_name}"
        forms[2] = f"{house} {street}, P.{w_name}, TP.{p_name}"
    text = forms[style]
    roll = rng.random()
    if roll < 0.25:
        text = strip_accents(text)
    elif roll < 0.32:
        text = text.lower()
    return text


class _GazIndex:
    """Flat picklable view of the catalog for executor-side rendering."""

    def __init__(self, gaz: Gazetteer):
        self.old_wards = gaz.old_wards
        self.old_districts = {d["code"]: d for d in gaz.old_districts}
        self.old_provinces = {p["code"]: p for p in gaz.old_provinces}
        self.new_wards = gaz.new_wards
        self.new_provinces = {p["code"]: p for p in gaz.new_provinces}
        # (ward name, district name) pairs occurring exactly once across the
        # old catalog — the only pairs from which a province-omitted mention
        # (style 10) is unambiguously recoverable.
        from collections import Counter

        wd = Counter(
            (w["name"].lower(), self.old_districts[w["district_code"]]["name"].lower())
            for w in gaz.old_wards
        )
        self.unique_wd = frozenset(k for k, n in wd.items() if n == 1)


def render_page(page_id: int, gidx: _GazIndex, seed: int = 42) -> tuple[tuple, list[tuple]]:
    """Deterministic page from (seed, page_id): (pages_row, gold_rows)."""
    rng = random.Random((seed << 32) ^ page_id)
    url = f"https://ex{page_id % 997}.vn/p{page_id}"
    ts = _EPOCH + dt.timedelta(seconds=page_id * 137 % 31_536_000)
    lang = "en" if rng.random() < 0.06 else "vi"
    filler = _FILLER_EN if lang == "en" else _FILLER_VI
    lines = [rng.choice(filler) for _ in range(rng.randint(2, 5))]

    golds: list[tuple] = []
    if lang == "vi":
        n_mentions = rng.choices([0, 1, 2, 3], weights=[15, 55, 22, 8])[0]
        for _ in range(n_mentions):
            use_new = rng.random() < 0.25 and gidx.new_wards
            if use_new:
                ward = rng.choice(gidx.new_wards)
                province = gidx.new_provinces[ward["province_code"]]
                district = None
                codes = (province["code"], None, ward["code"], True)
            else:
                ward = rng.choice(gidx.old_wards)
                district = gidx.old_districts[ward["district_code"]]
                province = gidx.old_provinces[district["province_code"]]
                codes = (province["code"], district["code"], ward["code"], False)
            mention = _render_mention(rng, ward, district, province, gidx.unique_wd)
            lines.insert(rng.randrange(len(lines) + 1), f"{rng.choice(_TRIGGERS)}{mention}.")
            golds.append((url, mention) + codes)

    text = "\n".join(lines)
    page = (url, ts, b"<html><body>" + text.encode("utf-8") + b"</body></html>", text, lang)
    return page, golds


def synth_pages_local(gaz: Gazetteer, n_pages: int, seed: int = 42) -> tuple[list[tuple], list[tuple]]:
    """Driver-side generation for small test corpora."""
    gidx = _GazIndex(gaz)
    pages, golds = [], []
    for pid in range(n_pages):
        page, g = render_page(pid, gidx, seed)
        pages.append(page)
        golds.extend(g)
    return pages, golds


def synth_pages_spark(
    spark: SparkSession,
    gaz: Gazetteer,
    n_pages: int,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed generation: ``spark.range(n)`` → ``mapInPandas`` rendering.

    Scales linearly with executors (no driver materialization, no shuffle);
    per-row determinism keyed on (seed, page_id) makes output invariant to the
    partition layout.
    """
    import pandas as pd

    gidx = _GazIndex(gaz)
    sc = spark.sparkContext
    bc = sc.broadcast(gidx)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = bc.value
        for batch in batches:
            rows = [render_page(int(pid), g, seed)[0] for pid in batch["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    rng_df = spark.range(n_pages, numPartitions=partitions)
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def gold_mentions_spark(
    spark: SparkSession, gaz: Gazetteer, n_pages: int, seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed gold sidecar (same determinism contract as the pages)."""
    import pandas as pd

    gidx = _GazIndex(gaz)
    bc = spark.sparkContext.broadcast(gidx)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = bc.value
        cols = ["url", "mention", "province_code", "district_code", "ward_code", "is_new"]
        for batch in batches:
            rows = []
            for pid in batch["id"]:
                rows.extend(render_page(int(pid), g, seed)[1])
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(n_pages, numPartitions=partitions).mapInPandas(gen, schema=GOLD_SCHEMA)
