#!/usr/bin/env python
"""Local emulation of the driver's sf0.01 correctness gate.

The driver compares each registered query against its DuckDB oracle at
sf0.01 (row count + schema + value hash over name-sorted columns). The
pytest parity suite mirrors that at sf0.001 — which leaves a residual
risk class this tool closes: divergences that only materialize with more
rows (ROUND ties landing on half-cent boundaries, float aggregation
order, engine type widenings). Run it before a round ends:

    python tools/driver_emulator.py                  # unchecked queries, sf0.01
    python tools/driver_emulator.py --all            # every oracle query
    python tools/driver_emulator.py name [name ...]  # specific queries

Exit 1 if any compared query mismatches. The compare is strictly harsher
than a hash: exact Python-value equality AND type-name equality per cell
(int vs float mismatches that a repr-based hash might mask are errors
here).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iii_aibigdata_capstone_spark.queries import ALL_SPECS, _DRIVER_VERIFIED
from iii_aibigdata_capstone_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(columns, rows):
    """The driver-compare canonical form: columns sorted by name, rows
    sorted, -0.0 and NaN normalized. Keeps (type, value) per cell."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple((v is None, str(type(v)), str(v)) for v in r))
    return out


def main() -> None:
    import duckdb

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    check_all = "--all" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    specs = [s for s in ALL_SPECS if s.oracle is not None]
    if args:
        specs = [s for s in specs if s.name in set(args)]
    elif not check_all:
        specs = [s for s in specs if s.name not in _DRIVER_VERIFIED]

    spark = get_spark(app_name="iii-capstone-driver-emulator")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    failures = []
    for spec in specs:
        t0 = time.time()
        try:
            sdf = spec.builder(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rel = con.sql(spec.oracle)
            d_cols = list(rel.columns)
            d_rows = rel.fetchall()
            status = "ok"
            detail = ""
            if sorted(s_cols) != sorted(d_cols):
                status, detail = "schema_mismatch", f"{s_cols} vs {d_cols}"
            elif len(s_rows) != len(d_rows):
                status, detail = "rows_mismatch", f"{len(s_rows)} vs {len(d_rows)}"
            else:
                s_norm = normalize(s_cols, s_rows)
                d_norm = normalize(d_cols, d_rows)
                bad = [
                    (a, b)
                    for a, b in zip(s_norm, d_norm)
                    if a != b
                    or any(type(x) is not type(y) for x, y in zip(a, b))
                ]
                if bad:
                    status = "value_mismatch"
                    detail = f"{len(bad)}/{len(s_norm)} rows; first {bad[0]}"[:300]
        except Exception as ex:
            status, detail = "error", f"{type(ex).__name__}: {ex}"[:300]
            s_rows = []
        rec = {
            "query": spec.name,
            "status": status,
            "rows": len(s_rows),
            "sec": round(time.time() - t0, 2),
        }
        if detail:
            rec["detail"] = detail
        if status != "ok":
            failures.append(rec)
        print(json.dumps(rec), flush=True)

    print(
        f"driver-emulator: {len(specs) - len(failures)}/{len(specs)} ok at {sf_dir}"
    )
    if failures:
        print("FAILURES:", json.dumps(failures, indent=1), file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
