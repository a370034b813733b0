"""Freeze the flagship ER oracle into a committed fixture.

Runs ``plans.er_oracle.local_er_expected`` (LocalParser + union-find over
the seed-fixed 120-page synthetic corpus) and writes the canonical,
sha256-stamped expected output to ``tests/fixtures/er_expected_120.json``.
``tests/test_er_local_oracle.py`` asserts both directions: the live oracle
still matches the committed hash, and the distributed pipeline reproduces
the fixture rows + cluster partition.

Usage: python scripts/gen_er_expected.py [n_pages]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120

    from address_parser_spark.gazetteer import synth_gazetteer
    from address_parser_spark.plans.er_oracle import (
        expected_to_canonical,
        expected_to_driver_rows,
        local_er_expected,
    )

    rows, partition = local_er_expected(synth_gazetteer(), n_pages)
    doc = expected_to_canonical(rows, partition)
    doc["n_pages"] = n_pages
    out = REPO / "tests" / "fixtures" / f"er_expected_{n_pages}.json"
    out.write_text(json.dumps(doc, ensure_ascii=False, indent=1), encoding="utf-8")
    driver_rows = expected_to_driver_rows(rows, partition)
    out_jsonl = REPO / "tests" / "fixtures" / f"er_expected_{n_pages}_rows.jsonl"
    out_jsonl.write_text(
        "".join(json.dumps(r, ensure_ascii=False) + "\n" for r in driver_rows),
        encoding="utf-8",
    )
    print(f"{out}: {doc['n_rows']} rows, {doc['n_clusters']} clusters, "
          f"sha256={doc['sha256'][:16]}…")
    print(f"{out_jsonl}: {len(driver_rows)} driver-oracle rows")


if __name__ == "__main__":
    main()
