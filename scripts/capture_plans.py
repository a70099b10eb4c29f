"""Capture .explain('formatted') for every registered query.

    python scripts/capture_plans.py <out_dir> [sf_dir] [name ...]

Writes <out_dir>/<query>.txt per query (or only the named ones). Used by
the optimization rounds to snapshot plan shapes before/after a change
(guide §1: measure first; §7.2: read the plan).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata2016w_spark import get_spark  # noqa: E402
from bigdata2016w_spark.registry import all_specs  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name, spec in specs.items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - best-effort snapshot
            plan = f"ERROR building plan: {e!r}\n"
        (out_dir / f"{name}.txt").write_text(plan)
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
