"""Semantics tests for the retrieval re-ranking batch
(operators/rerank.py), with numpy replays of the selection logic."""

import numpy as np
import pyarrow.parquet as pq

from cdmx_airquality_etl_spark.operators.rerank import (
    _MMR_K,
    _MMR_POOL,
    _PRF_TOPK,
    _RRF_C,
    _RRF_TOPK,
)
from cdmx_airquality_etl_spark.registry import QUERIES


def _emb(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    return {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in t.itertuples()
        if np.isfinite(np.asarray(r.embedding, dtype=np.float64)).all()
        and (np.asarray(r.embedding, dtype=np.float64) ** 2).sum() > 0
    }


def _cos(a, b):
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))


def test_mmr_matches_greedy_replay(spark, sf_dir):
    rows = sorted(QUERIES["q_mmr_rerank"](spark, sf_dir).collect(), key=lambda r: r["pick"])
    assert len(rows) == _MMR_K
    vecs = _emb(sf_dir)
    q = vecs[0]
    scored = sorted(
        ((float(_cos(v, q)), vid) for vid, v in vecs.items() if vid != 0),
        key=lambda t: (-t[0], t[1]),
    )[:_MMR_POOL]
    pool = {vid: rel for rel, vid in scored}
    selected = []
    first = max(pool.items(), key=lambda kv: (kv[1], -kv[0]))
    # tiebreak: rel desc, vec_id asc
    first = sorted(pool.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    selected.append(first[0])
    while len(selected) < _MMR_K:
        best = None
        for vid, rel in pool.items():
            if vid in selected:
                continue
            msim = max(float(_cos(vecs[vid], vecs[s])) for s in selected)
            key = (-(rel - msim), vid)
            if best is None or key < best[0]:
                best = (key, vid)
        selected.append(best[1])
    assert [r["vec_id"] for r in rows] == selected


def test_mmr_first_pick_is_most_relevant_and_diverse_later(spark, sf_dir):
    rows = sorted(QUERIES["q_mmr_rerank"](spark, sf_dir).collect(), key=lambda r: r["pick"])
    rels = [r["rel"] for r in rows]
    assert rels[0] == max(rels)  # pick 1 is pure relevance
    assert len({r["vec_id"] for r in rows}) == _MMR_K  # no repeats


def test_query_expansion_overlap_bounds(spark, sf_dir):
    r = QUERIES["q_query_expansion"](spark, sf_dir).collect()[0]
    assert 0 <= r["overlap_at_k"] <= _PRF_TOPK
    # feedback centroid includes the top results, so expansion should
    # retain at least one of the originals on any reasonable corpus
    assert r["overlap_at_k"] >= 1


def test_rank_fusion_matches_replay(spark, sf_dir):
    rows = QUERIES["q_rank_fusion"](spark, sf_dir).collect()
    assert 0 < len(rows) <= _RRF_TOPK
    vecs = _emb(sf_dir)
    q = vecs[0]
    cos_rank = {
        vid: i + 1
        for i, (_, vid) in enumerate(
            sorted(
                ((-float(_cos(v, q)), vid) for vid, v in vecs.items() if vid != 0)
            )
        )
    }
    dot_rank = {
        vid: i + 1
        for i, (_, vid) in enumerate(
            sorted(((-float(v @ q), vid) for vid, v in vecs.items() if vid != 0))
        )
    }
    for r in rows:
        assert r["cos_rank"] == cos_rank[r["vec_id"]]
        assert r["dot_rank"] == dot_rank[r["vec_id"]]
        rrf = 1.0 / (_RRF_C + r["cos_rank"]) + 1.0 / (_RRF_C + r["dot_rank"])
        assert abs(r["rrf"] - rrf) < 1e-15
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
