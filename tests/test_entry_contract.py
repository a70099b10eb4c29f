"""Driver-contract invariants: entry() smoke, key consistency, callable
signatures — the cheap in-suite guard for __spark_entry__."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 50
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in os_.values())


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert df.columns == ["c_name", "l_orderkey", "orderdate",
                          "o_orderpriority", "revenue"]


def test_all_queries_runnable_at_smallest_sf(spark):
    """Every registered callable must at least build a valid plan against
    sf0.001 (no analysis errors); execution is covered by oracle suites."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
