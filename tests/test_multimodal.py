"""Multimodal plumbing tests: binary payload + metadata schema, Arrow-batched
decode stub determinism, frame-sampling flatMap shape, and the
NotImplementedError gate for the real decoder."""

import pytest
from pyspark.sql import functions as F

from cdmx_airquality_etl_spark.multimodal import (
    attach_binary,
    decode_media,
    resize_media,
    sample_frames,
)
from cdmx_airquality_etl_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return attach_binary(docs, "doc_id", "text", mime="text/plain").cache()


def test_attach_binary_meta(media):
    rows = media.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r["meta"]["mime"] == "text/plain"
    assert r["meta"]["n_bytes"] == len(bytes(r["payload"]))
    assert len(r["meta"]["sha256_prefix"]) == 16


def test_metadata_only_scan_prunes_payload(spark, sf_dir):
    # metadata queries must not deserialize payloads: the optimized plan
    # should not build the payload column at all (column pruning through
    # the struct projection). Uses a fresh, uncached frame — a cached one
    # would pin all columns in the InMemoryRelation.
    docs = load_table(spark, sf_dir, "documents")
    fresh = attach_binary(docs, "doc_id", "text", mime="text/plain")
    meta_df = fresh.select("media_id", "meta.n_bytes")
    plan = meta_df._jdf.queryExecution().optimizedPlan().toString()
    assert "encode" not in plan  # payload construction pruned away


def test_decode_media_deterministic(media):
    f1 = {r["media_id"]: r["feature"] for r in decode_media(media, dim=8, fake=True).collect()}
    f2 = {r["media_id"]: r["feature"] for r in decode_media(media, dim=8, fake=True).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_decode_media_real_path_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        decode_media(media, fake=False).collect()


def test_sample_frames(media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=3, fake=True)
    rows = frames.collect()
    assert {r["media_id"] for r in rows} == {r["media_id"] for r in media.collect()}
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, fr in by_media.items():
        assert [f["frame_idx"] for f in sorted(fr, key=lambda x: x["frame_idx"])] == list(
            range(len(fr))
        )
        assert all(len(bytes(f["frame_bytes"])) <= 64 for f in fr)


def test_resize_media_fixed_output_size(media):
    out = resize_media(media, width=16, height=8, fake=True).collect()
    assert len(out) == 50
    for r in out:
        assert (r["width"], r["height"]) == (16, 8)
        # the property downstream partition sizing relies on: output bytes
        # are fixed per row regardless of input payload size
        assert len(bytes(r["payload"])) == 16 * 8
    # deterministic
    again = resize_media(media, width=16, height=8, fake=True).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == {
        r["media_id"]: bytes(r["payload"]) for r in again
    }


def test_resize_media_real_path_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|image resizing"):
        resize_media(media, fake=False).collect()
