"""Z-order clustering must enable row-group skipping on EVERY clustered
column — measured directly from parquet footer min/max stats, the same
stats a scan's predicate pushdown consults."""

import glob

import pyarrow.parquet as pq


def _matching_row_groups(path_dir: str, col: str, lo: float, hi: float):
    """(row groups whose [min,max] intersects [lo,hi], total row groups)
    across all part files."""
    match = total = 0
    for f in glob.glob(f"{path_dir}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                match += 1
    return match, total


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    from bigdata2016w_spark.sources.catalog import load_table
    from bigdata2016w_spark.sources.sinks import write_zordered

    # sf0.01 regardless of the suite's sf_dir: row-group skipping needs
    # enough rows to produce >= 16 groups
    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    n = orders.count()
    lo_k, hi_k = 1, int(n * 0.02)  # ~2% selectivity on o_orderkey
    custs = sorted(r.o_custkey for r in orders.select("o_custkey").collect())
    lo_c, hi_c = custs[0], custs[max(0, int(len(custs) * 0.02) - 1)]

    zpath = str(tmp_path / "orders_z")
    write_zordered(orders, zpath, ["o_orderkey", "o_custkey"],
                   row_group_bytes=64 * 1024, num_files=16)
    # baseline: single-column sort prunes its own column only
    spath = str(tmp_path / "orders_s")
    (
        orders.repartitionByRange(16, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.option("parquet.block.size", str(64 * 1024)).parquet(spath)
    )

    zk, zt = _matching_row_groups(zpath, "o_orderkey", lo_k, hi_k)
    zc, _ = _matching_row_groups(zpath, "o_custkey", lo_c, hi_c)
    sk, st_ = _matching_row_groups(spath, "o_orderkey", lo_k, hi_k)
    sc, _ = _matching_row_groups(spath, "o_custkey", lo_c, hi_c)

    assert zt >= 8 and st_ >= 8  # enough row groups for skipping to mean anything
    # z-order prunes BOTH columns to a minority of row groups
    assert zk / zt < 0.5 and zc / zt < 0.5
    # the single-column layout cannot prune the other column
    assert sc / st_ > 0.9
    # and z-order's secondary-column pruning beats the single-sort layout's
    assert zc / zt < sc / st_

    # rows survive the rewrite exactly
    assert sorted(map(tuple, spark.read.parquet(zpath).collect())) == \
        sorted(map(tuple, orders.collect()))
