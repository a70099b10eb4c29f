"""Z-order layout arithmetic + skipping-stats query.

tests/test_zorder.py measures the PHYSICAL claim (parquet row-group
min/max pruning after sources.sinks.write_zordered); this file verifies
the portable ARITHMETIC (operators/layout.py) against a pure-Python
Morton reference in both engines, and the registered skipping query
against its DuckDB oracle plus the semantic ordering the layout exists
to produce (z-order prunes both dimensions; linear only its own;
natural neither).
"""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata2016w_spark.operators.layout import BITS, interleave_sql, scaled_sql
from bigdata2016w_spark.registry import all_specs
from tests.oracle import compare_spark_duckdb


def _py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b + 1)
        z |= ((y >> b) & 1) << (2 * b)
    return z


def test_interleave_sql_matches_python_reference_in_both_engines(spark):
    pairs = [(x, y) for x in (0, 1, 5, 63, 128, 200, 255)
             for y in (0, 2, 7, 99, 255)]
    expect = [_py_morton(x, y, BITS) for x, y in pairs]
    expr = interleave_sql("x", "y", BITS)

    vals = ", ".join(f"({x}, {y})" for x, y in pairs)
    duck = duckdb.connect().execute(
        f"SELECT {expr} FROM (VALUES {vals}) AS t(x, y)"
    ).fetchall()
    assert [r[0] for r in duck] == expect

    sdf = spark.createDataFrame(pairs, "x int, y int").selectExpr(
        "x", "y", f"{expr} AS z"
    )
    got = {(r["x"], r["y"]): r["z"] for r in sdf.collect()}
    assert [got[p] for p in pairs] == expect


@given(
    st.lists(
        st.tuples(st.integers(0, (1 << BITS) - 1),
                  st.integers(0, (1 << BITS) - 1)),
        min_size=1, max_size=32,
    ),
)
@settings(max_examples=40, deadline=None)
def test_interleave_sql_fuzz_vs_python(pairs):
    # DuckDB evaluates the generated text (same text Spark runs — the
    # two-engine agreement is pinned by the fixed-point test above);
    # hypothesis covers the whole (x, y) grid against the pure-Python
    # Morton reference, including the dedup/ordering-free VALUES path
    expr = interleave_sql("x", "y", BITS)
    vals = ", ".join(f"({x}, {y})" for x, y in pairs)
    got = duckdb.connect().execute(
        f"SELECT x, y, {expr} FROM (VALUES {vals}) AS t(x, y)"
    ).fetchall()
    for x, y, z in got:
        assert z == _py_morton(x, y, BITS)
        assert 0 <= z < 1 << (2 * BITS)


@given(st.integers(1, 10**6), st.integers(0, 10**6))
@settings(max_examples=60, deadline=None)
def test_scaled_sql_fuzz_bounds(span, off):
    # every in-domain value lands in [0, 2^bits) — the invariant the
    # interleave's bit budget needs; min maps to 0, the mapping is
    # monotone, and once the span covers the grid the max hits 2^bits-1
    lo, hi = off, off + span
    expr = scaled_sql("v", str(lo), str(hi), BITS, "//")
    got = duckdb.connect().execute(
        f"SELECT {expr} FROM (VALUES ({lo}), ({lo + span // 2}), "
        f"({hi})) t(v)"
    ).fetchall()
    v_lo, v_mid, v_hi = (r[0] for r in got)
    assert v_lo == 0
    assert v_lo <= v_mid <= v_hi
    assert all(0 <= v < (1 << BITS) for v in (v_lo, v_mid, v_hi))
    if span + 1 >= (1 << BITS):
        assert v_hi == (1 << BITS) - 1


def test_scaled_sql_exact_and_in_range(spark):
    # max maps to 2^bits - 1, min to 0, and both engines agree bit-for-bit
    expr_s = scaled_sql("v", "0", "999", 8, "DIV")
    expr_d = scaled_sql("v", "0", "999", 8, "//")
    vs = [0, 1, 499, 500, 998, 999]
    duck = duckdb.connect().execute(
        f"SELECT {expr_d} FROM (VALUES {', '.join(f'({v})' for v in vs)}) t(v)"
    ).fetchall()
    sdf = spark.createDataFrame([(v,) for v in vs], "v bigint").selectExpr(
        "v", f"{expr_s} AS s"
    )
    got = {r["v"]: r["s"] for r in sdf.collect()}
    assert [got[v] for v in vs] == [r[0] for r in duck]
    assert got[0] == 0 and got[999] == 255
    assert all(0 <= got[v] <= 255 for v in vs)


def test_zorder_skipping_matches_oracle(spark, sf_dir, duck):
    spec = all_specs()["lineitem_zorder_skipping"]
    compare_spark_duckdb(spec.fn(spark, sf_dir), duck, spec.oracle)


def test_zorder_skipping_semantics(spark, sf_dir):
    spec = all_specs()["lineitem_zorder_skipping"]
    rows = {r["strategy"]: r for r in spec.fn(spark, sf_dir).collect()}
    z = rows["zorder_part_supp"]
    lin = rows["linear_partkey"]
    nat = rows["natural_orderkey"]
    # the claim the layout exists for: z-order skips on BOTH dimensions
    assert z["skip_part"] > 0 and z["skip_supp"] > 0
    # a single-column sort cannot skip on the other dimension; arrival
    # order skips on neither
    assert lin["skip_supp"] == 0
    assert nat["skip_part"] == 0 and nat["skip_supp"] == 0
    # conjunctive scan cost: zorder < linear < natural (strict at the
    # generator's uniform key distributions, every SF)
    assert (z["rows_scanned_conj"] < lin["rows_scanned_conj"]
            < nat["rows_scanned_conj"])
    # fixed-grid chunk counts stay bounded by the geometry
    for r in rows.values():
        assert r["n_chunks"] <= 256


def test_zorder_skipping_plan_is_all_jvm(spark, sf_dir):
    spec = all_specs()["lineitem_zorder_skipping"]
    plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the 1-row stats/bounds frames must come in broadcast, not shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
