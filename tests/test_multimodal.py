"""Multimodal plumbing: fake-media attach, resize, feature extraction,
frame sampling (operators.multimodal). The codec steps are stubs; these
tests pin the schema / metadata / batch contracts around them."""

from osm_pg_etl_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
    resize_media,
    sample_frames,
)


def _media(spark):
    docs = spark.createDataFrame([(1, "x" * 500), (2, "short")],
                                 "doc_id long, text string")
    return attach_fake_media(docs)


def test_resize_clamps_and_shrinks(spark):
    media = _media(spark)
    r = {row["doc_id"]: row for row in resize_media(media, max_px=256).collect()}
    big = r[1]["media_meta"]
    assert 1 <= big["width"] <= 256 and 1 <= big["height"] <= 256
    assert len(r[1]["content"]) < 500          # stub re-encode shrank payload
    small = r[2]["media_meta"]
    assert (small["width"], small["height"]) == (6, 6)   # under max_px
    assert bytes(r[2]["content"]) == b"short"            # untouched


def test_extract_features_schema_and_values(spark):
    feats = {row["doc_id"]: row for row in extract_features(_media(spark)).collect()}
    assert feats[1]["n_bytes"] == 500
    assert feats[1]["feat_mean"] == float(ord("x"))
    assert feats[2]["n_bytes"] == 5
    assert set(feats[1].asDict()) == {"doc_id", "kind", "n_bytes",
                                      "content_hash", "feat_mean",
                                      "feat_entropy_proxy"}


def test_sample_frames_null_duration_yields_one_frame(spark):
    frames = sample_frames(_media(spark)).collect()
    assert {(f["doc_id"], f["frame_ms"]) for f in frames} == {(1, 0), (2, 0)}


def test_attach_fake_video_duration_and_frame_schedule(spark):
    import hashlib

    docs = spark.createDataFrame([(1, "x" * 500), (2, "short")],
                                 "doc_id long, text string")
    media = attach_fake_media(docs, kind="video")
    metas = {r["doc_id"]: r["media_meta"] for r in media.collect()}
    assert metas[1]["kind"] == "video"
    assert metas[1]["duration_ms"] == 500 % 5000 + 1500
    assert metas[2]["duration_ms"] == 5 % 5000 + 1500

    frames = sample_frames(media, every_ms=1000).collect()
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f["doc_id"], []).append(f)
    # duration 2000 -> offsets 0,1000; duration 1505 -> offsets 0,1000
    assert sorted(f["frame_ms"] for f in by_doc[1]) == [0, 1000]
    assert sorted(f["frame_ms"] for f in by_doc[2]) == [0, 1000]
    # digest is md5 of the payload slice at offset % len
    payload = b"x" * 500
    want = hashlib.md5(payload[0:64]).hexdigest()
    got = next(f["frame_hash"] for f in by_doc[1] if f["frame_ms"] == 0)
    assert got == want
