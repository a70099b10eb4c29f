"""Drive the driver contract end-to-end: run every ``queries()`` entry and
compare against ``oracle_sql()`` via DuckDB on the same parquet.

    python scripts/verify_contract.py [sf_dir]

Prints MATCH/MISMATCH per oracle-backed query (stringified, order- and
column-order-insensitive — a stricter typed compare lives in
tests/oracle.py) and rows-only counts for the rest. Exit code 1 on any
MISMATCH.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from bigdata2016w_spark import TABLES  # noqa: E402

# oracles valid only at the driver's sf0.01 gate, skipped at larger
# scale factors: O(n^2) DuckDB formulations, plus embedding_near_dupes,
# whose static 4-plane/1-table oracle is the exact twin ONLY at the gate
# corpus size (N=500 -> adaptive P=4, L=1; at sf0.1 the operator grows to
# P=6, L=4 — see plans/pipeline._EMB_NEAR_DUPES_SQL's scale note)
QUADRATIC = {"dedup_jaccard", "corpus_curation", "dedup_clusters",
             "dedup_clusters_star", "dedup_keep_best",
             "documents_rejection_audit",
             "embedding_near_dupes", "documents_incremental_dedup",
             "documents_containment_dupes",
             # embeds _SEMDEDUP_SQL's O(in-cell pairs) drop list
             "corpus_curation_semdedup",
             # two-batch PPJoin admission replay: O(n²) Jaccard tiers
             "documents_jaccard_admission",
             # static 4-plane twin of the adaptive embedding gate — exact
             # only at gate scale (same reason as embedding_near_dupes)
             "embeddings_semdedup_admission"}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    skip_quadratic = not sf.rstrip("/").endswith(("sf0.001", "sf0.01"))
    # Deliberately a BARE session, not get_spark(): the grading driver
    # builds its own session without the engine's confs (nanosAsLong, UTC
    # tz, Arrow, AQE), so correctness must hold on a vanilla session too.
    spark = (
        SparkSession.builder.appName("verify-contract")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = entrymod.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)

    failed = []
    for name in sorted(qs):
        srows = sorted(tuple(map(str, r)) for r in qs[name](spark, sf).collect())
        if name in oracles and not (skip_quadratic and name in QUADRATIC):
            drows = sorted(tuple(map(str, r)) for r in con.sql(oracles[name]).fetchall())
            ok = srows == drows
            print(f"{name}: spark={len(srows)} duckdb={len(drows)} -> "
                  f"{'MATCH' if ok else 'MISMATCH'}")
            if not ok:
                failed.append(name)
                print("  spark-only:", [r for r in srows if r not in drows][:2])
                print("  duck-only:", [r for r in drows if r not in srows][:2])
        else:
            print(f"{name}: rows-only, {len(srows)} rows")
    if failed:
        print("FAILED:", failed)
        return 1
    print("all oracle-backed queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
