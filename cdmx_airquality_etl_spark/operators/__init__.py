"""Operator modules register themselves into the query/oracle registry on
import; importing this package loads the full surface."""

from . import dedup, flagship, relational, similarity, textstats  # noqa: F401

__all__ = ["dedup", "flagship", "relational", "similarity", "textstats"]
