"""Randomized SQL-logic testing: generate predicates/projections from a
small grammar, run the same query through Spark SQL and DuckDB, compare.
A miniature of the SQLite logic-test methodology (SURVEY §5 notes the
reference had no such corpus)."""

import random

import pytest

from tests.oracle import compare_spark_duckdb

COLS = {
    "l_quantity": "num",
    "l_extendedprice": "num",
    "l_discount": "num",
    "l_linenumber": "num",
    "l_returnflag": "str",
    "l_linestatus": "str",
}
STR_VALS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
NUM_BOUNDS = {
    "l_quantity": (1, 50),
    "l_extendedprice": (1000, 100000),
    "l_discount": (0.0, 0.1),
    "l_linenumber": (1, 7),
}


def _atom(rng: random.Random) -> str:
    col = rng.choice(list(COLS))
    if COLS[col] == "str":
        op = rng.choice(["=", "<>", "IN"])
        if op == "IN":
            vals = rng.sample(STR_VALS[col], rng.randint(1, 2))
            return f"{col} IN ({', '.join(repr(v) for v in vals)})"
        return f"{col} {op} {rng.choice(STR_VALS[col])!r}"
    lo, hi = NUM_BOUNDS[col]
    v = round(rng.uniform(lo, hi), 3)
    op = rng.choice(["<", "<=", ">", ">=", "="])
    return f"{col} {op} {v}"


def _predicate(rng: random.Random, depth: int = 2) -> str:
    if depth == 0 or rng.random() < 0.4:
        a = _atom(rng)
        return f"NOT ({a})" if rng.random() < 0.2 else a
    lhs = _predicate(rng, depth - 1)
    rhs = _predicate(rng, depth - 1)
    return f"({lhs} {rng.choice(['AND', 'OR'])} {rhs})"


def _query(rng: random.Random) -> str:
    pred = _predicate(rng)
    mode = rng.choice(["count", "grouped", "grouped2"])
    if mode == "count":
        return f"SELECT count(*) AS n FROM lineitem WHERE {pred}"
    if mode == "grouped":
        return (
            "SELECT l_returnflag, count(*) AS n, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q "
            f"FROM lineitem WHERE {pred} GROUP BY l_returnflag"
        )
    return (
        "SELECT l_returnflag, l_linestatus, count(*) AS n, "
        "min(l_linenumber) AS mn, max(l_linenumber) AS mx "
        f"FROM lineitem WHERE {pred} GROUP BY l_returnflag, l_linestatus"
    )


@pytest.mark.parametrize("seed", range(40))
def test_random_query_agrees(seed, spark, sf_dir, duck):
    from bigdata2016w_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    sql = _query(random.Random(seed))
    compare_spark_duckdb(spark.sql(sql), duck, sql)
