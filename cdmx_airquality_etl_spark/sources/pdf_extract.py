"""PDF text extraction seam — the reference's latent PDF capability
(pdfminer/PyPDF2 pinned in /root/reference/requeriments.txt:30-31,47 but
never imported by scrapper.py), given the multimodal build contract: the
Spark-side plumbing (schema, Arrow batching, flatMap page fan-out,
column-pruned payloads) is real and tested; the byte-level decode is
gated — it uses ``pypdf`` when importable, raises NotImplementedError in
this container, and ``fake=True`` substitutes a deterministic
bytes-derived pseudo-extraction so the full pipeline shape is testable.

Swap-in cost on a real cluster is zero plan changes: ``pip install
pypdf`` on executors and drop ``fake``.

Scale notes: payloads stay one opaque binary column (metadata-only reads
never deserialize them); extraction is mapInPandas — embarrassingly
parallel, no shuffle; the page fan-out yields (doc_id, page_no) grain
ready for subdoc-style dedup (operators/subdoc.py) downstream.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PDF_PAGES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("page_no", IntegerType(), False),
        StructField("text", StringType(), True),
        StructField("n_page_bytes", LongType(), True),
    ]
)

_FAKE_PAGE_BYTES = 256  # fake extraction: one pseudo-page per 256 bytes


def _pypdf_pages(payload: bytes) -> list[str]:
    try:
        import io

        from pypdf import PdfReader  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - env-gated
        raise NotImplementedError(
            "PDF extraction requires the pypdf package, not present in this "
            "environment; pass fake=True for the deterministic stub"
        ) from e
    return [p.extract_text() or "" for p in PdfReader(io.BytesIO(payload)).pages]


def _fake_pages(payload: bytes) -> list[str]:
    """Deterministic pseudo-extraction: one 'page' per fixed-size byte
    slice, text derived from the slice content — re-runs are byte-stable
    and page counts are predictable for tests."""
    import hashlib

    return [
        f"page {i} {hashlib.md5(payload[o : o + _FAKE_PAGE_BYTES]).hexdigest()[:12]}"
        for i, o in enumerate(range(0, max(len(payload), 1), _FAKE_PAGE_BYTES))
    ]


def extract_pdf_pages(
    docs: DataFrame,
    *,
    fake: bool = False,
    extractor: Callable[[bytes], list[str]] | None = None,
) -> DataFrame:
    """(doc_id, payload binary) → (doc_id, page_no, text, n_page_bytes),
    one row per extracted page. ``extractor`` overrides the decode for
    tests or alternative libraries; NULL payloads yield no pages (the
    V-NULL convention — missing input flows to the gate, never crashes
    the job)."""
    fn = extractor or (_fake_pages if fake else _pypdf_pages)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            nos: list[int] = []
            texts: list[str] = []
            sizes: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                for i, text in enumerate(fn(payload)):
                    ids.append(int(doc_id))
                    nos.append(i)
                    texts.append(text)
                    sizes.append(len(payload))
            yield pd.DataFrame(
                {"doc_id": ids, "page_no": nos, "text": texts, "n_page_bytes": sizes}
            )

    return docs.select("doc_id", "payload").mapInPandas(
        _extract, schema=PDF_PAGES_SCHEMA
    )
