"""Semantics tests for the sub-document dedup batch (operators/subdoc.py),
with Python replays and a synthetic-duplicate corpus proving the operators
fire on actual duplication."""

import hashlib
import os
import re
from collections import Counter, defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.operators.subdoc import _BLOCK_W, _HEADER_K
from cdmx_airquality_etl_spark.registry import QUERIES


def _docs(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


def _md5_int(s, nchars=15):
    return int(hashlib.md5(s.encode()).hexdigest()[:nchars], 16)


def _py_blocks(text):
    w = text.strip().lower().split()
    return [
        " ".join(w[b * _BLOCK_W : (b + 1) * _BLOCK_W])
        for b in range(len(w) // _BLOCK_W)
    ]


# ---------------------------------------------------------------------------
# q_block_dedup
# ---------------------------------------------------------------------------
def test_block_dedup_matches_python(spark, sf_dir):
    rows = {r["block_hash"]: r for r in QUERIES["q_block_dedup"](spark, sf_dir).collect()}
    assert rows, "corpus near-dups must share at least one disjoint block"
    by_block_docs = defaultdict(set)
    by_block_n = Counter()
    for rec in _docs(sf_dir).itertuples():
        for blk in _py_blocks(rec.text):
            h = _md5_int(blk)
            by_block_docs[h].add(rec.doc_id)
            by_block_n[h] += 1
    expect = {h for h, d in by_block_docs.items() if len(d) >= 2}
    assert set(rows) == expect
    for h in expect:
        assert rows[h]["n_docs"] == len(by_block_docs[h])
        assert rows[h]["n_occurrences"] == by_block_n[h]


# ---------------------------------------------------------------------------
# q_doc_dup_ratio
# ---------------------------------------------------------------------------
def test_doc_dup_ratio_matches_python(spark, sf_dir):
    rows = {r["doc_id"]: r for r in QUERIES["q_doc_dup_ratio"](spark, sf_dir).collect()}
    docs = _docs(sf_dir)
    by_block_docs = defaultdict(set)
    doc_blocks = {}
    for rec in docs.itertuples():
        blks = [_md5_int(b) for b in _py_blocks(rec.text)]
        if blks:
            doc_blocks[rec.doc_id] = blks
        for h in blks:
            by_block_docs[h].add(rec.doc_id)
    shared = {h for h, d in by_block_docs.items() if len(d) >= 2}
    assert set(rows) == set(doc_blocks)
    some_dup = False
    for did, blks in doc_blocks.items():
        r = rows[did]
        ndup = sum(1 for h in blks if h in shared)
        assert r["n_blocks"] == len(blks)
        assert r["n_dup_blocks"] == ndup
        assert abs(r["dup_ratio"] - ndup / len(blks)) < 1e-12
        some_dup = some_dup or ndup > 0
    assert some_dup


# ---------------------------------------------------------------------------
# q_template_headers
# ---------------------------------------------------------------------------
def test_template_headers_matches_python(spark, sf_dir):
    rows = {r["header_hash"]: r for r in QUERIES["q_template_headers"](spark, sf_dir).collect()}
    assert rows
    docs = _docs(sf_dir)
    groups = defaultdict(list)
    for rec in docs.itertuples():
        w = rec.text.strip().lower().split()
        if len(w) >= _HEADER_K:
            groups[_md5_int(" ".join(w[:_HEADER_K]))].append(rec.source)
    expect = {h: v for h, v in groups.items() if len(v) >= 2}
    assert set(rows) == set(expect)
    for h, sources in expect.items():
        assert rows[h]["n_docs"] == len(sources)
        assert rows[h]["n_sources"] == len(set(sources))


# ---------------------------------------------------------------------------
# q_tokenizer_fertility
# ---------------------------------------------------------------------------
def test_tokenizer_fertility_matches_python(spark, sf_dir):
    rows = {r["lang"]: r for r in QUERIES["q_tokenizer_fertility"](spark, sf_dir).collect()}
    docs = _docs(sf_dir)
    bpe = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    for lang, g in docs.groupby("lang"):
        ws = sum(len(t.strip().lower().split()) for t in g["text"])
        bp = sum(len(bpe.findall(t)) for t in g["text"])
        ch = sum(len(t) for t in g["text"])
        r = rows[lang]
        assert (r["ws_tokens"], r["bpe_tokens"], r["chars"]) == (ws, bp, ch)
        assert abs(r["fertility"] - bp / ws) < 1e-12
        assert abs(r["chars_per_token"] - ch / bp) < 1e-12
        assert r["fertility"] >= 1.0  # BPE-ish splits never merge words


# ---------------------------------------------------------------------------
# synthetic-duplicate corpus: the operators must FIRE on real duplication
# ---------------------------------------------------------------------------
def test_block_dedup_fires_on_synthetic_duplicates(spark, tmp_path):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    uniq = "kilo lima mike november oscar papa quebec romeo sierra tango"
    other = "uniform victor whiskey xray yankee zulu one two three four"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([base + " " + uniq, base + " extra words here", other]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s1", "s2", "s1"]),
            "n_chars": pa.array([1, 1, 1], pa.int64()),
        }
    )
    os.makedirs(tmp_path, exist_ok=True)
    pq.write_table(docs, f"{tmp_path}/documents.parquet")
    rows = QUERIES["q_block_dedup"](spark, str(tmp_path)).collect()
    # docs 1 and 2 share exactly the first 10-token block
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2
    ratios = {r["doc_id"]: r["dup_ratio"] for r in QUERIES["q_doc_dup_ratio"](spark, str(tmp_path)).collect()}
    assert ratios[1] == 0.5  # one of its two blocks is shared
    assert ratios[2] == 1.0  # its single block is the shared one
    assert ratios[3] == 0.0  # fully unique document
