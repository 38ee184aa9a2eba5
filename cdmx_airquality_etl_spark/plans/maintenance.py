"""Table maintenance for parquet lakehouse tables: small-file compaction and
range-clustered rewrite.

Why this is part of the engine: the reference accumulates history by merging
a ~20-row snapshot every hour (/root/reference/launcher.bat:2,
scrapper.py:188-224). On SQLite that is free; on a parquet lake every merge
writes new files, and after a year the table is 8760 snapshots of tiny files
— the classic small-file problem that kills scan throughput at 100 TB (task
scheduling + footer reads dominate). Compaction is therefore the required
companion of plans/merge.py, same as OPTIMIZE on Delta/Iceberg.

Scale design:
- Compaction sizes output files from *measured* bytes (target_file_bytes),
  not a guessed partition count, and rewrites only partitions whose current
  layout is worse than ``min_files_to_compact`` — an idempotent, incremental
  maintenance pass.
- ``cluster_rewrite`` range-partitions on the clustering keys and sorts
  within partitions, so every output file owns a disjoint key range and
  parquet row-group min/max stats prune files for key-range predicates —
  the poor man's Z-ORDER, exact for 1-D key prefixes.
- Both rewrites go through dynamic partition overwrite (partitioned) or
  atomic directory swap (unpartitioned) — never a partial state, M-TXN's
  guarantee (scrapper.py:208-221).
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# A path is remote when it carries an authority-form URI (scheme://) or ANY
# scheme in its single-colon shorthand form — 'scheme:/path' (colon followed
# immediately by a slash) is valid Hadoop shorthand for whatever filesystem
# that scheme is configured to, so an allowlist of known schemes would let an
# unlisted one (dbfs:/tbl, alluxio:/tbl) slip through as a relative POSIX
# path and silently report 0 files (round-8 ADVICE). 'file:' is handled by
# the caller before this check. A relative local path whose first segment
# merely contains a colon followed by a NON-slash (e.g. 'run:2026/table') is
# NOT a scheme — rejecting it was the round-7 over-match this anchors away.
_REMOTE_SCHEME = re.compile(
    r"^[a-zA-Z][a-zA-Z0-9+.-]+:(?://|/)",
    re.IGNORECASE,
)


def _local_path(path: str) -> str:
    """Resolve ``path`` to a plain POSIX path the os module can operate on.

    This module is EXPLICITLY local/POSIX-only: the M-TXN guarantee
    rests on os.rename being atomic, which holds for a local filesystem
    and for nothing behind an object-store scheme (S3 rename is
    copy+delete; a crash mid-'rename' loses the guarantee silently).
    Cluster tables get maintenance from their table format instead — the
    ACID seam (plans/merge.py ACID_PROVIDERS) dispatches to engines whose
    OPTIMIZE/rewrite own the commit protocol. Fail loudly rather than
    corrupt quietly.

    ``file:`` URIs ARE local, but must be stripped to a bare path before
    any os.walk/os.stat/os.rename — passing the raw URI through made
    table_stats('file:///x') silently report 0 files (os.walk of a
    nonexistent relative './file:///x') and merge's os.rename raise
    mid-swap, exactly the silent-wrong-answer/corrupt-window this guard
    exists to prevent. Accepted forms: ``file:/p``, ``file:///p``
    (empty authority); a ``file://host/p`` remote authority is refused."""
    if path.startswith("file:"):
        rest = path[len("file:"):]
        if rest.startswith("//"):
            rest = rest[2:]
            if not rest.startswith("/"):
                raise NotImplementedError(
                    f"file:// URI with a remote host authority is not a "
                    f"local path: {path!r}"
                )
        if not rest.startswith("/"):
            raise NotImplementedError(f"malformed file: URI: {path!r}")
        return rest
    if _REMOTE_SCHEME.match(path):
        raise NotImplementedError(
            f"parquet maintenance is local-filesystem-only (atomic-rename "
            f"M-TXN guarantee); got {path!r}. On cluster storage use an "
            f"ACID table format's own maintenance (see plans/merge.py)."
        )
    return path


def _assert_local_path(path: str) -> None:
    """Validation-only form of :func:`_local_path` (kept for callers that
    must refuse remote schemes but handle the path themselves — they are
    expected to rebind through ``_local_path`` before os-level work)."""
    _local_path(path)


def _data_files(path: str) -> list[tuple[str, int]]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("_"):
                fp = os.path.join(root, f)
                out.append((fp, os.stat(fp).st_size))
    return out


def table_stats(spark: SparkSession, path: str) -> dict:
    """Layout health: file count, bytes, avg file size — the signal that
    decides whether a compaction pass is worth scheduling."""
    path = _local_path(path)
    files = _data_files(path)
    total = sum(sz for _, sz in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "avg_file_bytes": total // len(files) if files else 0,
    }


def partition_columns(path: str) -> list[str]:
    """Hive-style partition columns of a parquet dir (from `col=value`
    subdirectory names), outermost first; [] for flat tables."""
    path = _local_path(path)
    cols: list[str] = []
    cur = path
    while True:
        subdirs = [
            d for d in os.listdir(cur)
            if os.path.isdir(os.path.join(cur, d)) and "=" in d
        ]
        if not subdirs:
            return cols
        cols.append(subdirs[0].split("=", 1)[0])
        cur = os.path.join(cur, subdirs[0])


def _atomic_swap_write(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    """Write-tmp-then-rename swap (M-TXN, scrapper.py:208-221). Preserves a
    Hive partition layout when ``partition_cols`` is given — a maintenance
    rewrite must never flatten the layout merge_into_parquet created, or
    partition pruning and dynamic partition overwrite both break.

    The instant between the two renames has no directory at ``path``; the
    previous state survives at ``<path>__old_*`` for manual recovery (true
    atomic dir swap needs a transactional table format — Delta/Iceberg slot
    in here)."""
    path = _local_path(path)
    tmp = f"{path}__tmp_{uuid.uuid4().hex}"
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def recover_table(path: str) -> bool:
    """Crash recovery for the swap window documented on _atomic_swap_write:
    if ``path`` is missing but a ``<path>__old_*`` survivor exists (process
    died between the two renames), restore the newest survivor. Returns True
    when a restore happened. Run before reads on a table whose maintenance
    job may have crashed."""
    path = _local_path(path)
    if os.path.exists(path):
        return False
    parent, base = os.path.dirname(path) or ".", os.path.basename(path)
    survivors = [
        os.path.join(parent, d)
        for d in os.listdir(parent)
        if d.startswith(f"{base}__old_")
    ]
    if not survivors:
        return False
    # newest by mtime, NOT by name: the suffix is a random uuid, so a stale
    # survivor from an earlier crash could sort after the real latest state
    os.rename(max(survivors, key=os.path.getmtime), path)
    return True


def vacuum(path: str, max_age_seconds: int = 24 * 3600) -> int:
    """Remove leftover ``__tmp_*`` / ``__old_*`` siblings of ``path`` older
    than ``max_age_seconds`` (crashed rewrites leak them by design — the tmp
    write or the post-swap rmtree died). Never touches a survivor that
    recover_table would still need: if ``path`` itself is missing, vacuum
    refuses to delete ``__old_*`` dirs. Returns the number removed."""
    path = _local_path(path)
    import time

    def tree_mtime(p: str) -> float:
        # an in-flight partitioned write touches only subdirs/files, not the
        # top-level dir — age by the NEWEST mtime in the tree so active
        # writes never look stale
        newest = os.path.getmtime(p)
        for root, dirs, files in os.walk(p):
            for n in dirs + files:
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(root, n)))
                except OSError:
                    pass
        return newest

    parent, base = os.path.dirname(path) or ".", os.path.basename(path)
    table_missing = not os.path.exists(path)
    removed = 0
    for d in os.listdir(parent):
        is_tmp = d.startswith(f"{base}__tmp_")
        is_old = d.startswith(f"{base}__old_")
        if not (is_tmp or is_old):
            continue
        if is_old and table_missing:
            continue  # recovery material
        full = os.path.join(parent, d)
        try:
            if time.time() - tree_mtime(full) >= max_age_seconds:
                # ignore_errors: the swap's own rmtree(old) may race us
                shutil.rmtree(full, ignore_errors=True)
                removed += 1
        except FileNotFoundError:
            pass
    return removed


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict:
    """Rewrite ``path`` into ceil(total_bytes / target_file_bytes) files.

    Returns before/after stats. No-op (and no rewrite) when the table already
    has fewer than ``min_files_to_compact`` files or is already at/over the
    target size per file — safe to run on a schedule."""
    before = table_stats(spark, path)
    n_target = max(1, -(-before["total_bytes"] // target_file_bytes))
    if (
        before["n_files"] < min_files_to_compact
        or before["n_files"] <= n_target
    ):
        return {"before": before, "after": before, "rewritten": False}

    pcols = partition_columns(path)
    df = spark.read.parquet(path)
    # coalesce, not repartition: merging files needs no shuffle. With a
    # partitioned layout each output task writes one file per partition it
    # holds, so n_target bounds files per partition, not the total.
    _atomic_swap_write(df.coalesce(n_target), path, partition_cols=pcols)
    return {"before": before, "after": table_stats(spark, path), "rewritten": True}


def _interleave_bits(x, y, bits: int):
    """Morton/Z-value of two ints already scaled to [0, 2^bits): native bit
    exprs only, stays inside codegen."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b + 1))
            .bitwiseOR(F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b))
        )
    return z


def zorder_rewrite(
    spark: SparkSession,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    bits: int = 16,
) -> dict:
    """Rewrite ``path`` clustered on the Morton (Z-order) curve of two
    numeric columns, so files are tight in BOTH dimensions and min/max stats
    skip files for predicates on either column — what 1-D range clustering
    (cluster_rewrite) cannot give for the second key. Columns are min/max
    scaled to ``bits`` before interleaving (one extra agg pass)."""
    before = table_stats(spark, path)
    df = spark.read.parquet(path)
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).first()
    span = (1 << bits) - 1

    def scaled(c, lo, hi):
        rng = (hi - lo) or 1
        return ((F.col(c) - F.lit(lo)) * span / F.lit(rng)).cast("long")

    z = _interleave_bits(scaled(col_x, lo_x, hi_x), scaled(col_y, lo_y, hi_y), bits)
    clustered = (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    _atomic_swap_write(clustered, path, partition_cols=partition_columns(path))
    return {"before": before, "after": table_stats(spark, path), "rewritten": True}


def cluster_rewrite(
    spark: SparkSession,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``path`` range-clustered on ``cluster_cols``: repartitionByRange
    + sortWithinPartitions, so each output file covers a disjoint range of the
    leading cluster key and min/max stats skip files at read time."""
    before = table_stats(spark, path)
    if n_files is None:
        n_files = max(1, -(-before["total_bytes"] // target_file_bytes))
    df = spark.read.parquet(path)
    clustered = df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
    clustered = clustered.sortWithinPartitions(*cluster_cols)
    _atomic_swap_write(clustered, path, partition_cols=partition_columns(path))
    return {"before": before, "after": table_stats(spark, path), "rewritten": True}
