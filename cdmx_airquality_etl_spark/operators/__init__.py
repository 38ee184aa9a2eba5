"""Operator modules register themselves into the query/oracle registry on
import; importing this package loads the full surface."""

from . import flagship, relational  # noqa: F401

__all__ = ["flagship", "relational"]
