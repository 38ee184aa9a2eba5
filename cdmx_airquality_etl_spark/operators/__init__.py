"""Operator modules register themselves into the query/oracle registry on
import; importing this package loads the full surface."""

from . import (  # noqa: F401
    analytics,
    clustering,
    corpus_quality,
    corpus_stats,
    dedup,
    diagnostics,
    entity,
    flagship,
    graph,
    graph_ext,
    incremental,
    llm_ops,
    pipeline_ops,
    planning,
    relational,
    robust,
    relational_ext,
    relational_ext2,
    relational_ext3,
    relational_ext4,
    retail,
    scale_ops,
    similarity,
    stats_tests,
    timeseries,
    textstats,
    tpch_ext,
    tpch_ext2,
    udf_surface,
    warehouse,
)

__all__ = [
    "dedup",
    "flagship",
    "relational",
    "similarity",
    "textstats",
    "udf_surface",
]
