"""Query registry: one entry per operator declared done (SURVEY.md §2).

Each :class:`QuerySpec` pairs a Spark DataFrame builder ``(spark, sf_dir) ->
DataFrame`` with the ANSI-SQL oracle DuckDB runs on the same parquet tables.
``oracle=None`` marks genuinely non-SQL-expressible operators (greedy NMS,
pose assembly, LSH, model inference) — the driver records a weaker
rows-only check for those.

Column-name discipline: every computed column is aliased identically in the
Spark builder and the oracle SQL — the driver sorts columns by name before
value-hashing, so names are part of the contract.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


def make_registrar(specs: list[QuerySpec]):
    """Return a decorator that appends a QuerySpec to ``specs``.

    Usage::

        SPECS: list[QuerySpec] = []
        query = make_registrar(SPECS)

        @query("q1_pricing_summary", oracle="SELECT ...")
        def q1(spark, sf_dir): ...
    """

    def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
        def deco(fn: Builder) -> Builder:
            specs.append(QuerySpec(name=name, builder=fn, oracle=oracle, tags=tags))
            return fn

        return deco

    return register
