"""Pure-Python HTML mini-parser (stdlib only — the container has no
bs4/lxml) for the report-page structure the reference scrapes:

- div-by-id point lookups with stripped text (S-DIV, scrapper.py:30-33)
- <table> grids inside container divs: rows of cell texts plus the first
  <img src> per row (S-TBL / F-IMG, scrapper.py:77-106)

This module is executor-side code: it runs inside Arrow-batched pandas UDFs
(sources/html_ingest.py), one call per page. It has no Spark imports.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser


@dataclass
class TableRow:
    cells: list[str] = field(default_factory=list)
    img_src: str | None = None


@dataclass
class ParsedPage:
    div_texts: dict[str, str] = field(default_factory=dict)
    tables: dict[str, list[TableRow]] = field(default_factory=dict)


# HTML void elements: no end tag exists, so they must not move the depth
# counter. Real scraped pages write these WITHOUT a self-closing slash
# (`<img src=...>`); only XHTML-style `<img .../>` balances by itself via
# handle_startendtag.
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _PageParser(HTMLParser):
    """One-pass parser: accumulates text per tracked div id and table rows
    per container div id."""

    def __init__(self, div_ids: set[str], table_div_ids: set[str]):
        super().__init__(convert_charrefs=True)
        self._div_ids = div_ids
        self._table_div_ids = table_div_ids
        self.page = ParsedPage()

        # (id, depth) stacks for open tracked regions
        self._open_text_divs: list[tuple[str, int, list[str]]] = []
        self._open_table_div: tuple[str, int] | None = None
        self._depth = 0

        self._cur_rows: list[TableRow] | None = None
        self._cur_row: TableRow | None = None
        self._cur_cell: list[str] | None = None

    def handle_starttag(self, tag, attrs):
        if tag not in _VOID_TAGS:
            self._depth += 1
        attrd = dict(attrs)
        if tag == "div":
            div_id = attrd.get("id")
            if div_id in self._div_ids:
                self._open_text_divs.append((div_id, self._depth, []))
            if div_id in self._table_div_ids and self._open_table_div is None:
                self._open_table_div = (div_id, self._depth)
        elif tag == "table" and self._open_table_div is not None and self._cur_rows is None:
            self._cur_rows = []
        elif tag == "tr" and self._cur_rows is not None:
            self._cur_row = TableRow()
        elif tag in ("td", "th") and self._cur_row is not None:
            self._cur_cell = []
        elif tag == "img":
            src = attrd.get("src")
            if self._cur_row is not None and self._cur_row.img_src is None:
                self._cur_row.img_src = src

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:  # matching starttag never incremented depth
            return
        if tag in ("td", "th") and self._cur_cell is not None and self._cur_row is not None:
            self._cur_row.cells.append(" ".join("".join(self._cur_cell).split()))
            self._cur_cell = None
        elif tag == "tr" and self._cur_row is not None and self._cur_rows is not None:
            self._cur_rows.append(self._cur_row)
            self._cur_row = None
        elif tag == "table" and self._cur_rows is not None and self._open_table_div:
            div_id = self._open_table_div[0]
            self.page.tables.setdefault(div_id, self._cur_rows)
            self._cur_rows = None
        elif tag == "div":
            if self._open_table_div and self._depth == self._open_table_div[1]:
                self._open_table_div = None
            while self._open_text_divs and self._depth == self._open_text_divs[-1][1]:
                div_id, _, chunks = self._open_text_divs.pop()
                # get_text(strip=True) equivalence: concat then collapse ws
                self.page.div_texts.setdefault(div_id, " ".join("".join(chunks).split()))
        self._depth -= 1

    def handle_data(self, data):
        if self._cur_cell is not None:
            self._cur_cell.append(data)
        for _, _, chunks in self._open_text_divs:
            chunks.append(data)


def parse_page(html: str, div_ids: list[str], table_div_ids: list[str]) -> ParsedPage:
    p = _PageParser(set(div_ids), set(table_div_ids))
    p.feed(html or "")
    p.close()
    return p.page
