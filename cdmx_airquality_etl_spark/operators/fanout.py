"""Host-gated fan-out of under-split scans (guide §2.1/§2.6/§6).

Every driver test table is a single-row-group parquet file, so its scan
is ONE task and all pre-exchange compute — shingling, anchor/prefix
emission, the Arrow signature kernels — runs single-threaded no matter
how wide ``local[N]`` is (the round-12 examination's "single-task
pre-exchange stages" finding, and why the driver's 8-vs-32 scaling
ratios sit ≈ 1 for most dedup queries). The scale-correct shape is the
one a 100 TB table produces naturally: the scan splits by
``maxPartitionBytes`` into far more tasks than cores. This helper
restores that shape at test scale with a round-robin repartition to
``defaultParallelism``, applied ONLY when the scan has fewer partitions
than the cluster width — so on real data, where the scan already
splits, it inserts nothing.

Round 12 prototyped the unconditional form and measured it a REGRESSION
(OPTIMIZATION_r12.md §7): that week the sandbox VM's effective
parallelism was ~5 cores (its committed 1/4/32-partition probe measured
0.45/0.42/0.68 s — 32-way fan-out was net negative), so parallelizing
paid pure scheduling overhead. The r12 VERDICT's ask #6 is the
HOST-CONDITIONAL form shipped here: once per process, a Spark-side
probe times the same small hash-heavy aggregate at 1 partition and at
``defaultParallelism`` partitions, and fan-out engages only when the
parallel run actually wins (measured on the healthy r13 window:
1p ≈ 4.0 s vs 32p ≈ 0.4 s on the probe's full-size twin, and the real
anchor emission 3.3 → 1.1 s). The probe is hash-over-string per row —
deliberately compute-dense like the emissions it stands in for; a
row-trivial probe (xxhash64 of a long) measures only scheduling
overhead and cannot see the win (measured flat 1p/32p on the same
window that runs emissions 3× faster in parallel).

Correctness: a repartition only moves rows. Callers must still be
partition-order-insensitive — every consumer here aggregates exact
integers or computes row-local scores (the dedup family's documented
bitwise-portability discipline), so placement cannot change any result.
``spark.sql.execution.sortBeforeRepartition`` (default on) keeps the
round-robin assignment deterministic under task retries.

``SPARK_GRAFT_SCAN_FANOUT`` overrides: ``0`` disables (the r12 shape),
``1`` forces fan-out without probing (deterministic plans for tests),
``auto``/unset probes the host.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (pid, defaultParallelism) -> target partitions (0 = fan-out disengaged).
# Keyed per process so a forked worker re-probes its own host window.
_PROBE_CACHE: dict[tuple[int, int], int] = {}

_PROBE_ROWS = 250_000
# Demand a real parallel win before engaging: on the r12 degraded window
# the parallel run LOST to the single-partition run (0.68 vs 0.45 s on
# r12's committed probe), so the 0.6 bar keeps that host on the r12
# shape; on the healthy window the ratio measures ~0.1-0.2.
_ENGAGE_RATIO = 0.6


def _probe_frame(spark: SparkSession, n_partitions: int) -> DataFrame:
    # md5-over-string per row: compute-dense like the shingle/anchor
    # emissions this gate serves, so per-task scheduling overhead does
    # not drown the signal (a bare xxhash64(id) probe measures flat).
    return spark.range(0, _PROBE_ROWS, 1, numPartitions=n_partitions).select(
        F.bit_xor(
            F.conv(
                F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10
            ).cast("long")
        ).alias("x")
    )


def scan_fanout_parallelism(spark: SparkSession) -> int:
    """Target partition count for under-split scans, or 0 to leave the
    scan alone. Probes the host once per (process, parallelism)."""
    mode = os.environ.get("SPARK_GRAFT_SCAN_FANOUT", "auto")
    if mode == "0":
        return 0
    dp = spark.sparkContext.defaultParallelism
    if dp <= 1:
        return 0
    if mode == "1":
        return dp
    key = (os.getpid(), dp)
    if key not in _PROBE_CACHE:
        def run(np: int, rows: int = _PROBE_ROWS) -> float:
            t0 = time.perf_counter()
            _probe_frame(spark, np).collect()  # one row — bounded collect
            return time.perf_counter() - t0

        spark.sparkContext.setJobDescription("fanout host probe")
        try:
            _probe_frame(spark, min(4, dp)).collect()  # JIT warm-up
            t_one = run(1)
            t_par = run(dp)
        finally:
            spark.sparkContext.setJobDescription(None)
        _PROBE_CACHE[key] = dp if t_par < _ENGAGE_RATIO * t_one else 0
    return _PROBE_CACHE[key]


def fan_out_scan(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` to cluster width IF it is under-split and the
    host profits from parallelism (see module docstring). No-op on real
    multi-split inputs, on ``SPARK_GRAFT_SCAN_FANOUT=0``, and on hosts
    whose probe shows no parallel win."""
    n = scan_fanout_parallelism(df.sparkSession)
    if not n:
        return df
    # under-split check: the physical scan's split count. At 100 TB the
    # scan yields >> defaultParallelism splits and nothing is inserted;
    # the single-row-group test files yield 1.
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
