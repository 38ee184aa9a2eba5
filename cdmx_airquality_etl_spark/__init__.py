"""cdmx_airquality_etl_spark — a PySpark-native engine with the query and
data-processing capabilities of AlexHG1989/cdmx-airquality-etl (see SURVEY.md),
generalized to a full relational + LLM-data-pipeline surface designed for
100 TB scale."""

from . import operators  # noqa: F401  (registers the query surface)
from .registry import ORACLES, QUERIES
from .session import get_spark

__all__ = ["ORACLES", "QUERIES", "get_spark"]
