from .dynamic_fetch import fetch_rendered
from .pages_datasource import HtmlPagesDataSource, register_html_pages
from .parquet import load_table, load_tables, register_views
from .pdf_extract import extract_pdf_pages

__all__ = [
    "HtmlPagesDataSource",
    "extract_pdf_pages",
    "fetch_rendered",
    "load_table",
    "load_tables",
    "register_views",
    "register_html_pages",
]
