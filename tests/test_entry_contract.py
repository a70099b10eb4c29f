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


def test_driver_window_leads_with_unverified_queries():
    """The driver samples the FIRST 50 names of queries() for its
    correctness file; _WINDOW_FRONT pins that window. Every name must be
    registered, unique, and actually lead the returned ordering."""
    from bigdata2016w_spark.registry import _WINDOW_FRONT

    names = list(entrymod.queries())
    assert len(_WINDOW_FRONT) == 50 == len(set(_WINDOW_FRONT))
    assert names[:50] == _WINDOW_FRONT
