#!/usr/bin/env python
"""12-run standalone decay: the bench-mover adjudicator.

Usage: python tools/decay.py <query> [<query> ...] [--runs 12]

For EACH named query, launches a FRESH JVM subprocess that executes the
query ``--runs`` times back-to-back (noop sink, System.gc() between runs,
same warmup as bench.py) and prints the per-iteration wall times plus the
min and the steady state (median of the last 4 runs). This is the
adjudication discipline from BENCH_NOTES: a bench mover is NOISE unless
its fresh-JVM standalone decay floor moved too. Queries run serially —
never run this concurrently with pytest/emulator/bench (CPU contention
corrupts every number).

Output: one JSON line per query
  {"query": name, "runs": [...], "min": m, "steady": s}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def child(name: str, runs: int) -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from iii_aibigdata_capstone_spark.queries import flagship, registry
    from iii_aibigdata_capstone_spark.session import get_spark

    spark = get_spark(app_name=f"decay-{name}")
    spark.sparkContext.setLogLevel("OFF")
    # Same warmup as bench.py: flagship primes JVM/codegen, identity
    # mapInPandas primes the Python worker pool.
    flagship(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .mapInPandas(lambda it: it, "doc_id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    builder = registry()[name].builder
    samples: list[float] = []
    for _ in range(runs):
        spark._jvm.System.gc()
        t0 = time.time()
        builder(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {
                "query": name,
                "runs": samples,
                "min": min(samples),
                "steady": round(statistics.median(samples[-4:]), 3),
            }
        ),
        flush=True,
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("queries", nargs="*")
    parser.add_argument("--runs", type=int, default=12)
    parser.add_argument("--child", help=argparse.SUPPRESS)
    args = parser.parse_args()
    if args.child:
        child(args.child, args.runs)
        return
    for name in args.queries:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", name,
             "--runs", str(args.runs)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if proc.returncode != 0:
            print(
                json.dumps({"query": name, "error": proc.stderr[-300:]}),
                flush=True,
            )


if __name__ == "__main__":
    main()
