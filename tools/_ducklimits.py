"""Shared DuckDB resource caps for the oracle tools (round-9 ADVICE).

A fixed ``SET memory_limit='48GB'`` protects a 128 GiB host from the
sf3-sweep OOM-kill, but on a smaller host it RAISES DuckDB's cap above its
own default (80% of RAM) and reintroduces the co-tenant kill it exists to
prevent.  Derive the cap from the host instead: min(48 GB, half of
physical RAM), overridable via ``SPARK_GRAFT_DUCK_MEM`` (any DuckDB
memory-limit string, e.g. '12GB') for hosts the heuristic misjudges.
"""

from __future__ import annotations

import os

_CAP_GB = 48


def duck_memory_limit() -> str:
    env = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if env:
        return env
    try:
        total = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        half_gb = max(1, int(total / (2 * 1024**3)))
    except (ValueError, OSError, AttributeError):
        half_gb = _CAP_GB  # RAM unknowable: keep the historical cap
    return f"{min(_CAP_GB, half_gb)}GB"


def apply_duck_limits(con) -> None:
    """Bound the oracle side of a differential sweep: RAM-aware memory
    cap plus a temp spill directory, so DuckDB stays a well-behaved
    co-tenant next to the Spark JVM at any scale factor."""
    con.sql(f"SET memory_limit='{duck_memory_limit()}'")
    con.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
