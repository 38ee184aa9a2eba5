"""Pattern-extraction functions.

Generalizes F-IMG (/root/reference/scrapper.py:101-102: ``<img src>`` →
svg basename) and the reference's dictionary decode F-DICT
(scrapper.py:49 + config.yaml:5-17).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F


def svg_basename(col: Column) -> Column:
    """`.../buena.svg` → `buena` (scrapper.py:101-102), as a single
    regexp_extract instead of split+replace."""
    return F.regexp_extract(col, r"([^/]+)[.]svg$", 1)


def map_decode(col: Column, mapping: dict) -> Column:
    """Small-dictionary decode as a literal MAP lookup (F-DICT,
    scrapper.py:49). For maps this size Catalyst constant-folds the literals;
    for anything bigger use a broadcast dim join instead."""
    kv = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    return kv[col]
