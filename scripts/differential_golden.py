"""Differential eval of the engine against the reference golden-450 baseline.

Adapts the golden set's EXPECTED components into the reference comparison
shape (``eval_parsers._adapt_new_result``: ctryname / ctrysubdivname /
ctrysubsubdivname) as the baseline, parses every golden input with
``LocalParser`` (the same pure functions the distributed kernel runs), and
runs ``operators.eval.differential_eval`` + ``diff_counts`` over the two —
the tracked per-field mismatch table recorded in BASELINE.md each round.

Street text is excluded from both sides (the golden set has no street
ground truth), so ctrysubsubdivname reduces to [ward].

Usage: python scripts/differential_golden.py   → one JSON line
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF_DATA = Path("/root/reference/fuzz/data")
FIXTURE = REPO / "tests" / "fixtures" / "parse_golden.json"


def main() -> None:
    from address_parser_spark.gazetteer.synth import Gazetteer
    from address_parser_spark.operators.eval import diff_counts, differential_eval
    from address_parser_spark.plans.local_parser import LocalParser
    from address_parser_spark.session import get_spark

    golden = json.loads(FIXTURE.read_text(encoding="utf-8"))

    def load(name):
        return json.loads((REF_DATA / name).read_text(encoding="utf-8"))

    gaz = Gazetteer(
        old_provinces=load("old_provinces.json"),
        old_districts=load("old_districts.json"),
        old_wards=load("old_wards.json"),
        new_provinces=load("provinces.json"),
        new_wards=load("wards.json"),
        ward_mappings=[],
    )
    lp = LocalParser(gaz)

    parsed_rows, baseline_rows = [], []
    for case in golden["cases"]:
        text = case["text"]
        out = lp.process(text)
        parsed_rows.append((
            text,
            out["province"]["name"] if out["province"] else None,
            out["district"]["name"] if out["district"] else None,
            out["ward"]["name"] if out["ward"] else None,
            None,  # street excluded from the comparison
            out["format"],
            out["is_new"],
        ))
        exp = case["expected"]
        ward = (exp.get("ward") or "").strip()
        baseline_rows.append((
            text,
            exp.get("province") or "",
            exp.get("district") or "",
            [ward] if ward else [],
        ))

    spark = get_spark("differential_golden", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    parsed = spark.createDataFrame(
        parsed_rows,
        "address string, province string, district string, ward string, "
        "street_address string, format string, is_new boolean",
    )
    baseline = spark.createDataFrame(
        baseline_rows,
        "address string, ctryname string, ctrysubdivname string, "
        "ctrysubsubdivname array<string>",
    )
    counts = diff_counts(differential_eval(parsed, baseline, key="address"))
    counts["match_rate"] = round(
        1 - (counts["ctryname"] + counts["ctrysubdivname"] + counts["ctrysubsubdivname"])
        / (3 * counts["total"]), 4,
    )
    print(json.dumps(counts))
    spark.stop()


if __name__ == "__main__":
    main()
