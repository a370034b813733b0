"""Driver-contract invariants for __spark_entry__ (no Spark session needed —
the full Spark-vs-DuckDB value comparison lives in scripts/check_oracles.py
and the driver's own CORRECTNESS run)."""

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    # every oracle belongs to a real query
    assert o <= q, f"orphan oracles: {o - q}"
    # every query is oracle-checked — including the flagship, whose oracle
    # is the committed expected-output fixture (an independent LocalParser +
    # union-find implementation; the cascade itself isn't ANSI-SQL)
    assert q == o, f"oracle-less queries: {q - o}"


def test_flagship_oracle_fixture_exists_and_is_committed():
    import subprocess
    from pathlib import Path

    sql = entry.oracle_sql()["er_resolve_pages"]
    assert "er_expected_120_rows.jsonl" in sql
    path = Path(entry._ER_FIXTURE_JSONL)
    assert path.exists()
    tracked = subprocess.run(
        ["git", "ls-files", "--error-unmatch", str(path)],
        cwd=path.parent, capture_output=True,
    )
    assert tracked.returncode == 0, "fixture must be committed, not generated"


def test_oracle_sql_is_nonempty_ansi_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
