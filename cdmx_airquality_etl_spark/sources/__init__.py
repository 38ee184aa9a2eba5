from .pages_datasource import HtmlPagesDataSource, register_html_pages
from .parquet import load_table, load_tables, register_views

__all__ = [
    "HtmlPagesDataSource",
    "load_table",
    "load_tables",
    "register_views",
    "register_html_pages",
]
