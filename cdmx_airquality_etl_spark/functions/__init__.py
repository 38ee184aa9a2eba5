from .dates import date_part_columns, pack_report_ts, unpack_report_ts
from .extract import map_decode, svg_basename
from .text import (
    fold_accents,
    normalize_text_col,
    normalize_text_nfkd,
    normalize_text_py,
    word_shingles,
    words,
)

__all__ = [
    "date_part_columns",
    "pack_report_ts",
    "unpack_report_ts",
    "map_decode",
    "svg_basename",
    "fold_accents",
    "normalize_text_col",
    "normalize_text_nfkd",
    "normalize_text_py",
    "word_shingles",
    "words",
]
