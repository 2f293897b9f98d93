#!/usr/bin/env python
"""Decompose a lane's bench cost: builder-call time (py4j plan
construction + any driver-side eager work) vs noop-sink execution time,
over N repetitions in ONE fresh JVM — the guide §1 "measure first" probe
that tells you whether to attack plan-build overhead, planning, or
execution.

    python tools/profile_lane.py x10_walk_pairs m4_lloyd_iterations --runs 3

Output: one JSON line per lane:
  {"query": name, "build": [...], "exec": [...], "total_min": t}

Never run concurrently with pytest/bench/emulator (CPU contention).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("names", nargs="+")
    parser.add_argument("--runs", type=int, default=3)
    args = parser.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from iii_aibigdata_capstone_spark.queries import flagship, registry
    from iii_aibigdata_capstone_spark.session import get_spark

    spark = get_spark(app_name="profile-lane")
    spark.sparkContext.setLogLevel("OFF")
    # same warmup as bench.py
    flagship(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .mapInPandas(lambda it: it, "doc_id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    specs = registry()
    for name in args.names:
        builder = flagship if name == "flagship" else specs[name].builder
        builds, execs = [], []
        for _ in range(args.runs):
            spark._jvm.System.gc()
            t0 = time.time()
            df = builder(spark, SF_DIR)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "build": builds,
                    "exec": execs,
                    "total_min": round(min(b + e for b, e in zip(builds, execs)), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
