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
