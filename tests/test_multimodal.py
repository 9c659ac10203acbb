from pyspark.sql import functions as F

from pgferry_spark.multimodal import (
    attach_fake_media,
    decode_image_meta,
    frame_sample,
    resize_images,
)


def media_df(spark):
    base = spark.createDataFrame(
        [(i, f"document number {i}") for i in range(12)], "doc_id: long, text: string"
    )
    return attach_fake_media(base, "doc_id", "text")


def test_media_schema_and_types(spark):
    m = media_df(spark)
    assert m.columns == ["media_id", "media_type", "payload", "mime", "byte_len"]
    rows = m.collect()
    assert all(r["byte_len"] == 16 for r in rows)  # md5 payload
    assert {r["media_type"] for r in rows} == {"image", "audio", "video"}


def test_decode_meta_deterministic(spark):
    m = media_df(spark)
    a = {r["media_id"]: r["checksum"] for r in decode_image_meta(m).collect()}
    b = {r["media_id"]: r["checksum"] for r in decode_image_meta(m).collect()}
    assert a == b
    meta = decode_image_meta(m).collect()
    assert all(16 <= r["width"] <= 255 and 16 <= r["height"] <= 255 for r in meta)


def test_decode_handles_null_payload(spark):
    m = media_df(spark).withColumn(
        "payload", F.when(F.col("media_id") == 0, None).otherwise(F.col("payload"))
    )
    meta = {r["media_id"]: r for r in decode_image_meta(m).collect()}
    assert meta[0]["width"] is None and meta[0]["checksum"] is None
    assert meta[1]["width"] is not None


def test_resize_bounds(spark):
    m = media_df(spark)
    out = resize_images(m, max_dim=64).collect()
    assert all(max(r["width"], r["height"]) <= 64 for r in out)


def test_frame_sample_fanout(spark):
    m = media_df(spark)
    frames = frame_sample(m, every_n=5)
    rows = frames.collect()
    assert all(r["frame_idx"] % 5 == 0 for r in rows)
    n_videos = m.filter(F.col("media_type") == "video").count()
    assert frames.select("media_id").distinct().count() == n_videos


def test_audio_segments_windows_clip_to_duration(spark):
    from pgferry_spark.multimodal.ops import attach_fake_media, audio_segments

    df = spark.createDataFrame(
        [(i, f"clip {i}") for i in range(30)], "id: long, text: string"
    )
    media = attach_fake_media(df, "id", "text")
    segs = audio_segments(media, segment_ms=5000).collect()
    assert segs, "audio rows exist (id % 3 == 1)"
    by_media = {}
    for r in segs:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_media.items():
        assert mid % 3 == 1  # only audio media segmented
        rows.sort(key=lambda r: r["seg_idx"])
        assert [r["seg_idx"] for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r["t_end_ms"] - r["t_start_ms"] == 5000
        tail = rows[-1]
        assert 0 < tail["t_end_ms"] - tail["t_start_ms"] <= 5000
        # contiguous coverage from 0
        assert rows[0]["t_start_ms"] == 0
        for a, b in zip(rows, rows[1:]):
            assert b["t_start_ms"] == a["t_end_ms"] if a["t_end_ms"] % 5000 == 0 else True
