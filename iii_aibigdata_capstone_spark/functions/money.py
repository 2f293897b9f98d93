"""Engine-neutral money canonicalization — ONE definition.

Money stored as DOUBLE is exact to two decimals in this schema, so
``floor(v * 100 + 0.5)`` recovers exact integer cents identically in Spark
and DuckDB (floor-of-half-up on identical doubles; ``rint``/banker's
rounding would not match cross-engine — the e12/r4 lesson). Every lane
that hashes, buckets, or sums money goes through these two helpers so the
canonicalization cannot drift between an oracle and its Spark twin
(the same single-definition discipline as textual.QUALITY_FEATURES_SQL
and the Bloom digest/field formulas).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def cents_sql(col: str = "o_totalprice") -> str:
    """Exact integer cents as SQL text — valid verbatim in BOTH Spark SQL
    and DuckDB (FLOOR returns DOUBLE in DuckDB and BIGINT in Spark; the
    explicit CAST makes both sides BIGINT)."""
    return f"CAST(FLOOR({col} * 100 + 0.5) AS BIGINT)"


def cents_col(col: str = "o_totalprice") -> F.Column:
    """The same canonicalization as a Catalyst column (LongType)."""
    return F.floor(F.col(col) * 100 + F.lit(0.5))
