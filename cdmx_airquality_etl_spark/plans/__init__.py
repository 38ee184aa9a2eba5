from .maintenance import (
    cluster_rewrite,
    compact,
    recover_table,
    table_stats,
    vacuum,
    zorder_rewrite,
)
from .merge import collapse_to_key_grain, merge_into_parquet, merge_upsert
from .rollup import batch_partials, merge_partials, refresh_rollup

__all__ = [
    "batch_partials",
    "cluster_rewrite",
    "collapse_to_key_grain",
    "compact",
    "merge_into_parquet",
    "merge_partials",
    "merge_upsert",
    "recover_table",
    "refresh_rollup",
    "table_stats",
    "vacuum",
    "zorder_rewrite",
]
