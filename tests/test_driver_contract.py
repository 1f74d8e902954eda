"""Driver-contract invariants (cheap, no Spark jobs): every query has an
oracle twin, names are well-formed, and the oracle SQL builders produce
non-empty statements without import-time side effects."""

import sys

sys.path.insert(0, ".")


def test_queries_and_oracles_align():
    import __spark_entry__ as e

    q, o = set(e.queries()), set(e.oracle_sql())
    assert q == o, f"missing oracles: {sorted(q - o)}; orphan oracles: {sorted(o - q)}"
    assert len(q) >= 50


def test_oracle_sql_statements_look_sane():
    import __spark_entry__ as e

    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
        # fragments embedded after WITH must never open their own top-level
        # WITH mid-statement (DuckDB dialect rule from CLAUDE.md)
        body = sql.strip()
        assert not body.startswith(","), name  # entries are complete statements


def test_all_queries_are_callables_with_driver_signature():
    import inspect

    import __spark_entry__ as e

    for name, fn in e.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert params == ["spark", "sf_dir"], f"{name}: {params}"
