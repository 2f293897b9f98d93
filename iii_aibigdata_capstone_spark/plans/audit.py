"""Structured audit of a DataFrame's formatted physical plan."""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass(frozen=True)
class PlanAudit:
    text: str

    @property
    def broadcast_joins(self) -> int:
        return self.text.count("BroadcastHashJoin")

    @property
    def sort_merge_joins(self) -> int:
        return self.text.count("SortMergeJoin")

    @property
    def hash_exchanges(self) -> int:
        # Spark 4 formatted explain lists each exchange's partitioning on an
        # "Arguments:" detail line; simple-mode explain inlines it. Count
        # whichever form this text uses (they never both appear).
        return max(
            len(re.findall(r"Exchange hashpartitioning", self.text)),
            len(re.findall(r"Arguments: hashpartitioning", self.text)),
        )

    @property
    def has_pushed_filters(self) -> bool:
        return (
            "PushedFilters: [" in self.text and "PushedFilters: []" not in self.text
        )

    @property
    def partition_filters(self) -> list[str]:
        return [
            line.strip()
            for line in self.text.splitlines()
            if "PartitionFilters" in line
        ]

    @property
    def read_widths(self) -> list[int]:
        """Column counts of every parquet ReadSchema in the plan."""
        return [
            len(s.split(","))
            for s in re.findall(r"ReadSchema: struct<([^>]*)>", self.text)
            if s
        ]

    @property
    def python_map_operators(self) -> int:
        # count numbered node headers only — formatted explain prints each
        # operator twice (tree line + "(N) Op" detail section), so a raw
        # substring count double-counts every node
        return len(
            re.findall(
                r"^\(\d+\) (?:MapInPandas|FlatMapGroupsInPandas)",
                self.text,
                re.MULTILINE,
            )
        )


def audit(df: DataFrame) -> PlanAudit:
    return PlanAudit(plan_text(df))
