"""Smoke test for the spark-submit entry point (jobs/run_pipeline.py).

Packages the library as a zip and launches the job through ``spark-submit
--py-files`` in a fresh process — the exact deployment shape from the
module docstring — then checks the output parquet carries the clustered
schema including the wired-in old↔new ward mapping columns (J4)."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _zip_package(target: Path) -> Path:
    zip_path = target / "address_parser_spark.zip"
    pkg = REPO / "address_parser_spark"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for py in pkg.rglob("*.py"):
            zf.write(py, py.relative_to(REPO))
    return zip_path


@pytest.mark.slow
def test_spark_submit_run_pipeline(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = str(Path(pyspark.__file__).parent / "bin" / "spark-submit")

    zip_path = _zip_package(tmp_path)
    pages = tmp_path / "pages.parquet"
    output = tmp_path / "clusters.parquet"
    store = tmp_path / "store"

    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]",
            "--py-files", str(zip_path),
            str(REPO / "jobs" / "run_pipeline.py"),
            "--pages", str(pages), "--output", str(output),
            "--store", str(store), "--synth-pages", "80",
        ],
        capture_output=True, text=True, timeout=900,
        cwd=str(tmp_path),  # fresh shell: not the repo dir, import comes from the zip
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    summary_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert summary_lines, proc.stdout[-2000:]
    summary = json.loads(summary_lines[-1])
    assert summary["pages"] == 80
    assert summary["mentions"] > 0
    assert 0 < summary["clusters"] <= summary["mentions"]
    assert summary["lineage_rows"] > 0

    # Output parquet carries the clustered + mapping schema.
    import pandas as pd

    frames = [pd.read_parquet(p) for p in output.glob("*.parquet")]
    out = pd.concat(frames, ignore_index=True)
    for col in ["url", "mention", "province", "district", "ward", "street_address",
                "format", "entity_key", "cluster_id", "new_ward_code", "new_ward_name"]:
        assert col in out.columns, col
    # every old-format mention with a ward resolves to a new-format code
    old_warded = out[(out["format"] == "old") & out["ward_code"].notna()]
    if len(old_warded):
        assert old_warded["new_ward_code"].notna().all()
