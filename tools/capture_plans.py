"""Capture `.explain("formatted")` output for registry queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: all).
The plan is captured from the DataFrame the registered builder returns,
before execution (AdaptiveSparkPlan isFinalPlan=false) — the shape the
judge checks claims against: Exchange count, join strategy, PushedFilters,
ReadSchema, BatchEvalPython/ArrowEvalPython nodes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from sorting_compressed_time_series_spark.queries import SPARK_QUERIES
    from sorting_compressed_time_series_spark.session import get_spark

    os.makedirs(out_dir, exist_ok=True)
    # PLANS_EXTRA_CONF="k=v;k=v" — e.g. re-enable an excluded optimizer rule
    # to reproduce the round-start plan for a _before capture
    extra = dict(
        kv.split("=", 1)
        for kv in os.environ.get("PLANS_EXTRA_CONF", "").split(";")
        if "=" in kv
    )
    spark = get_spark(app="plans", cores=8, shuffle_partitions=8, extra=extra)
    rc = 0
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
            rc = 1
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
