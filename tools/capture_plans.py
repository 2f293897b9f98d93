#!/usr/bin/env python
"""Capture `.explain("formatted")` output for named queries into
plans/<round>/<query>_<tag>.txt (round via $SPARK_GRAFT_PLAN_ROUND,
default r15) — the optimization round's before/after evidence files
(the judge checks plan claims against these).

    python tools/capture_plans.py before q1_pricing_summary x10_walk_pairs ...
    python tools/capture_plans.py after  q1_pricing_summary ...

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1 — the bench SF,
so PushedFilters / join strategies reflect what the bench actually runs).
explain() only plans (no job runs), so this is cheap; lanes that execute
driver-side actions while BUILDING the DataFrame (index builds, iterative
folds) still pay those.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15")
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "tag must be before|after"
    os.makedirs(OUT_DIR, exist_ok=True)

    from iii_aibigdata_capstone_spark.queries import flagship, registry
    from iii_aibigdata_capstone_spark.session import get_spark

    spark = get_spark(app_name=f"capture-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    for name in names:
        builder = flagship if name == "flagship" else specs[name].builder
        df = builder(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
