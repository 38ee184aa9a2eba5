"""Bloom-filter semi-join pre-filtering (optimization guide §3.2).

PySpark exposes no DataFrame Bloom builder (``DataFrameStatFunctions
.bloomFilter`` is Scala/Java-only) and Spark 4.1 does not SQL-register
``bloom_filter_agg`` / ``might_contain`` — but both halves exist in the
JVM and are reachable over py4j without any helper jar:

* build: ``df._jdf.stat().bloomFilter(col, expectedNumItems, fpp)``
  aggregates the column JVM-side (``putLong`` for integral columns) and
  returns an ``org.apache.spark.util.sketch.BloomFilter``, serialized
  here to its portable byte form;
* probe: ``BloomFilterMightContain(lit(bytes), value)`` — the exact
  catalyst predicate Spark's own runtime-filter injection (SPARK-32268)
  plants — evaluated with full codegen, no Python boundary. Its
  ``mightContainLong`` probes the same bit layout ``putLong`` wrote, so
  build and probe agree as long as both sides pass the SAME long key.

Exactness: a Bloom filter has false positives but NO false negatives,
so ``df.filter(might_contain(...))`` keeps every true-matching row.
Callers must therefore only use this to pre-shrink the probe side of a
join whose matches are re-checked by the join itself (candidate
generation feeding an exact verify — the dedup family's shape).

Scale shape (100 TB): the filter is BITS, not rows — 1 % fpp costs
~9.6 bits/key, so a corpus-linear key set that is far beyond broadcast
as rows (the r12 rejection of the semi-join variant) stays shippable as
a filter for another ~3 orders of magnitude; past that the per-class /
per-shard split of the same construction applies. The build is one
narrow aggregation over the key side (treeAggregate of fixed-size bit
arrays — no driver row collection), priced inside the timed region like
every other pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_filter_bytes(
    keys: DataFrame, col: str, expected: int, fpp: float = 0.01
) -> bytes:
    """Serialized Bloom filter over ``keys[col]`` (a LONG column).

    Runs one JVM-side aggregation job NOW (eager, like the bounded
    class-probe collects elsewhere in the dedup family); the result is a
    plan-embeddable constant. ``expected`` may overestimate freely (only
    costs bits: ~1.2 bytes/key at 1 % fpp); underestimating raises the
    false-positive rate, never drops a key.
    """
    jvm = keys.sparkSession._jvm
    try:
        jbf = keys._jdf.stat().bloomFilter(
            col, int(max(expected, 1)), float(fpp)
        )
    except Exception:
        # Spark's treeAggregate yields a null buffer for an EMPTY key
        # frame and DataFrameStatFunctions NPEs deserializing it
        # (BloomFilter.readFrom(null)). An empty key set means "nothing
        # matches": an explicit zero-insert filter has exactly that
        # semantics (might_contain = false for every probe).
        jbf = jvm.org.apache.spark.util.sketch.BloomFilter.create(1)
    bos = jvm.java.io.ByteArrayOutputStream()
    jbf.writeTo(bos)
    return bytes(bos.toByteArray())


def might_contain(filter_bytes: bytes, value: Column) -> Column:
    """Codegen'd Bloom membership predicate over a LONG column.

    Wraps catalyst's ``BloomFilterMightContain`` (binary-literal filter,
    long value) — the §3.2 "drop definitely-non-matching rows before the
    exchange" predicate, with zero per-row JVM↔Python cost.
    """
    from pyspark.sql import SparkSession
    from pyspark.sql.classic.column import Column as ClassicColumn

    jvm = SparkSession.getActiveSession()._jvm  # type: ignore[union-attr]
    eu = jvm.org.apache.spark.sql.classic.ExpressionUtils
    jexpr = jvm.org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        eu.expression(F.lit(bytearray(filter_bytes))._jc),
        eu.expression(value._jc),
    )
    return ClassicColumn(eu.column(jexpr))
