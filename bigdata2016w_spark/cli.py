"""Command-line entry points (the engine twin of the reference's per-tool
args4j/Scallop CLIs, SURVEY §2.13 — one argparse surface instead of a
class per job).

  python -m bigdata2016w_spark list
  python -m bigdata2016w_spark run q7_top_revenue --sf-dir /root/testdata/sf0.01
  python -m bigdata2016w_spark run dedup_jaccard --explain --limit 5
  python -m bigdata2016w_spark retrieve "mercy justice AND"
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bigdata2016w_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    runp = sub.add_parser("run", help="run a registered query")
    runp.add_argument("query")
    runp.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true",
                      help="print the formatted physical plan instead of rows")
    runp.add_argument("--output", help="write full result as parquet here")

    retp = sub.add_parser(
        "retrieve",
        help="boolean RPN retrieval over the documents table "
             "(BooleanRetrievalCompressed.java:46-77's query surface)",
    )
    retp.add_argument("rpn", help='postfix boolean query, e.g. "mercy justice AND"')
    retp.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    retp.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from bigdata2016w_spark.registry import all_specs

    specs = all_specs()
    if args.cmd == "list":
        for name, spec in sorted(specs.items()):
            head = (spec.doc or "").strip().splitlines()
            print(f"{name:28s} {'[oracle]' if spec.oracle else '[rows]  '} "
                  f"{head[0] if head else ''}")
        return 0

    if args.cmd == "retrieve":
        from bigdata2016w_spark import get_spark
        from bigdata2016w_spark.operators.retrieval import retrieve
        from bigdata2016w_spark.sources.catalog import load_table

        bad = [t for t in args.rpn.split() if t != t.lower() and t not in ("AND", "OR")]
        if not args.rpn.split() or bad:
            print(f"malformed RPN query {args.rpn!r} (terms are lowercase; "
                  "operators AND/OR)", file=sys.stderr)
            return 2
        spark = get_spark(app_name="cli-retrieve")
        spark.sparkContext.setLogLevel("WARN")
        try:
            hits = retrieve(
                load_table(spark, args.sf_dir, "documents"), args.rpn
            )
        except (ValueError, IndexError) as e:
            print(f"malformed RPN query {args.rpn!r}: {e}", file=sys.stderr)
            return 2
        hits.orderBy("doc_id").show(args.limit, truncate=80)
        return 0

    if args.query not in specs:
        print(f"unknown query {args.query!r}; `list` shows options",
              file=sys.stderr)
        return 2

    from bigdata2016w_spark import get_spark

    spark = get_spark(app_name=f"cli-{args.query}")
    spark.sparkContext.setLogLevel("WARN")
    df = specs[args.query].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.output:
        from bigdata2016w_spark.sources.sinks import write_parquet

        write_parquet(df, args.output)
        print(f"wrote {args.output}")
        return 0
    df.show(args.limit, truncate=80)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
