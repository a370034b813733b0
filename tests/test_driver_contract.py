"""Driver-contract invariants for __spark_entry__ (no Spark session needed —
the full Spark-vs-DuckDB value comparison lives in scripts/check_oracles.py
and the driver's own CORRECTNESS run)."""

import __spark_entry__ as entry


def test_every_query_has_an_oracle_except_the_flagship():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    # every oracle belongs to a real query
    assert o <= q, f"orphan oracles: {o - q}"
    # the ER pipeline is the only intentionally oracle-less entry (its
    # normalization is an ordered replacement cascade no SQL reproduces;
    # it is gated by the committed fixture + F1 pytest instead)
    assert q - o == {"er_resolve_pages"}


def test_oracle_sql_is_nonempty_ansi_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
