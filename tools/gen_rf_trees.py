#!/usr/bin/env python
"""Regenerate the frozen QUARTER_RF_TREES literal in ml/rf_apply.py.

Fits the canonical quarter pipeline on the sf0.01 training slice
(ml/quarter.fit_quarter_model — seed 42, deterministic frame), exports
the forest with export_rf_trees, and rewrites the literal in place.
Run after any change to the quarter model's data derivation or
hyperparameters; the export-equality test pins the result.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Canonical training dir — same env var the export-equality test honors.
# Deliberately NOT SPARK_GRAFT_SF_DIR: that one points bench at sf0.1, and
# inheriting it here would silently retrain the frozen literal off-slice.
SF_DIR = os.environ.get("SPARK_GRAFT_RF_TRAIN_DIR", "/root/testdata/sf0.01")
MODULE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "iii_aibigdata_capstone_spark",
    "ml",
    "rf_apply.py",
)


def main() -> None:
    from iii_aibigdata_capstone_spark.ml.quarter import fit_quarter_model
    from iii_aibigdata_capstone_spark.ml.rf_apply import export_rf_trees
    from iii_aibigdata_capstone_spark.session import get_spark

    spark = get_spark(app_name="gen-rf-trees")
    spark.sparkContext.setLogLevel("ERROR")
    trees = export_rf_trees(fit_quarter_model(spark, SF_DIR).stages[-1])

    lines = ",\n".join(f"    {t!r}" for t in trees)
    literal = f"QUARTER_RF_TREES: list = [\n{lines}\n]\n"
    with open(MODULE) as fh:
        src = fh.read()
    new = re.sub(
        r"QUARTER_RF_TREES: list = \[.*?\n\]\n|QUARTER_RF_TREES: list = \[\][^\n]*\n",
        literal,
        src,
        count=1,
        flags=re.S,
    )
    if literal not in src and new == src:
        raise SystemExit("QUARTER_RF_TREES assignment not found")
    n_nodes = sum(1 for t in trees for _ in _iter(t))
    if new == src:
        # steady state: the fresh fit equals the frozen literal
        print(f"unchanged: {len(trees)} trees, {n_nodes} nodes already frozen in {MODULE}")
        return
    with open(MODULE, "w") as fh:
        fh.write(new)
    print(f"wrote {len(trees)} trees, {n_nodes} nodes to {MODULE}")


def _iter(node):
    yield node
    if node[0] != "leaf":
        yield from _iter(node[3])
        yield from _iter(node[4])


if __name__ == "__main__":
    main()
