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


# ---------------------------------------------------------------------------
# Real PPM decode path (round 8 — the query-facing decode, oracle-backed)
# ---------------------------------------------------------------------------
from cdmx_airquality_etl_spark.multimodal import (  # noqa: E402
    _parse_ppm,
    decode_ppm,
    encode_ppm_fixture,
    ppm_fixture_payload,
)


def test_ppm_parser_spec_features():
    # comments and arbitrary whitespace in the header, per the netpbm spec
    body = bytes(range(2 * 2 * 3))
    data = b"P6 # trailing comment\n # another\n  2\t2\n# before maxval\n255\n" + body
    w, h, maxval, n_px, sr, sg, sb = _parse_ppm(data)
    assert (w, h, maxval, n_px) == (2, 2, 255, 4)
    assert (sr, sg, sb) == (sum(body[0::3]), sum(body[1::3]), sum(body[2::3]))


def test_ppm_parser_rejects_bad_payloads():
    with pytest.raises(ValueError, match="P6"):
        _parse_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        _parse_ppm(b"P6\n2 2\n255\n\x00\x00")  # body too short
    with pytest.raises(ValueError, match="2-byte"):
        _parse_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)


def test_ppm_fixture_roundtrip_matches_closed_form():
    for i in (0, 3, 17, 63):
        payload = ppm_fixture_payload(i)
        w, h, maxval, n_px, sr, sg, sb = _parse_ppm(payload)
        assert (w, h) == (8 + (i % 5) * 4, 6 + (i % 7) * 3)
        exp = [(i * 7 + p * 13) % 256 for p in range(w * h * 3)]
        assert sr == sum(exp[0::3])
        assert sg == sum(exp[1::3])
        assert sb == sum(exp[2::3])


def test_decode_ppm_end_to_end(spark):
    rows = decode_ppm(encode_ppm_fixture(spark.range(8))).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["maxval"] == 255
        assert r["n_pixels"] == r["width"] * r["height"]
        assert 0 <= r["sum_r"] <= 255 * r["n_pixels"]
