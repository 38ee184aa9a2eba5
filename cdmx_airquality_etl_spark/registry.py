"""Query/oracle registry.

Every operator module registers its queries here; ``__spark_entry__.py``
re-exports the dicts to the driver. Keeping the Spark implementation and the
DuckDB oracle SQL side by side in the same decorator call is what keeps
column names / rounding / semantics in sync (the driver hash-compares them).

Hash-stability policy for float columns (see SURVEY.md §5.1): any aggregated
monetary/double column is summed through ``DECIMAL(18,2|4)`` (exact,
order-independent in both engines) and only then cast back to double, so the
Spark and DuckDB values are bitwise identical regardless of partial-aggregation
order. Per-row double arithmetic is IEEE-deterministic and needs no such care.

Numeric-literal rule for oracle SQL: DuckDB parses ``0.15`` as DECIMAL, and
DECIMAL×BIGINT stays EXACT — one rounding *fewer* than Spark's double×long,
which diverges in the last ulp (bit q_mixing_weights at sf0.001). A float
literal in oracle arithmetic must either be multiplied against something
already DOUBLE (DECIMAL promotes to double, matching Spark) or be wrapped
``CAST(lit AS DOUBLE)`` first. Division by a power of two (``/ 32.0``,
``/ 64.0``) is exact in both engines and exempt.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a (spark, sf_dir) -> DataFrame query, optionally with its
    DuckDB oracle SQL. No oracle → the driver records a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
