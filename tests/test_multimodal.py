"""Multimodal binary-column plumbing: schema, batching, sniffing, stubs."""

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from lucene_spark.operators import multimodal as mm

PAYLOADS = [
    (0, b"\x89PNG\r\n\x1a\nrestofpng"),
    (1, b"\xff\xd8\xff\xe0JFIFdata"),
    (2, b"GIF89a...."),
    (3, b"RIFF....WAVE"),
    (4, b"plain text bytes"),
    (5, b""),
    (6, b"\x00\xff" * 500),
]


@pytest.fixture(scope="module")
def media_df(spark):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(PAYLOADS, schema=schema).repartition(3)


def test_media_metadata_sniffs_and_measures(media_df):
    rows = {r["doc_id"]: r for r in mm.media_metadata(media_df).collect()}
    assert rows[0]["media_type"] == "png"
    assert rows[1]["media_type"] == "jpeg"
    assert rows[2]["media_type"] == "gif"
    assert rows[3]["media_type"] == "riff"
    assert rows[4]["media_type"] == "unknown"
    for doc_id, buf in PAYLOADS:
        assert rows[doc_id]["byte_len"] == len(buf)
    import hashlib

    assert rows[6]["content_md5"] == hashlib.md5(b"\x00\xff" * 500).hexdigest()


def test_decode_images_fake_deterministic(media_df):
    rows = {r["doc_id"]: r for r in mm.decode_images(media_df, decoder="fake").collect()}
    assert len(rows) == len(PAYLOADS)
    for doc_id, buf in PAYLOADS:
        w, h, c, m = mm._fake_decode(buf)
        r = rows[doc_id]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        assert r["mean_value"] == m
        assert r["decoder"] == "fake"
    assert rows[5]["width"] == 0  # empty blob


def test_byte_histogram_counts_every_byte(media_df):
    rows = {r["doc_id"]: r for r in mm.byte_histogram(media_df).collect()}
    for doc_id, buf in PAYLOADS:
        got = np.array([rows[doc_id][f"h{i}"] for i in range(mm.N_HIST_BINS)])
        want = np.bincount(
            np.frombuffer(buf, dtype=np.uint8) >> 4, minlength=mm.N_HIST_BINS
        )
        assert (got == want).all(), doc_id
        assert got.sum() == len(buf)


def test_video_audio_validate_args(media_df):
    with pytest.raises(ValueError):
        mm.sample_video_frames(media_df, payload_col="nope")
    with pytest.raises(ValueError):
        mm.sample_video_frames(media_df, every_n=0)
    with pytest.raises(ValueError):
        mm.resample_audio(media_df, target_hz=0)
    with pytest.raises(ValueError):
        mm.resample_audio(media_df, target_hz=20, src_hz=10)
    with pytest.raises(ValueError):
        mm.decode_images(media_df, decoder="bogus")
    with pytest.raises(ValueError):
        mm.sample_video_frames(media_df, codec="bogus")


def test_video_frames_fake_codec(media_df):
    import numpy as np

    pdf = mm.sample_video_frames(
        media_df, every_n=2, frame_bytes=64, codec="fake"
    ).toPandas()
    src = {int(r["doc_id"]): bytes(r["payload"]) for r in media_df.collect()}
    assert len(pdf) > 0
    for _, row in pdf.head(25).iterrows():
        buf = src[int(row["doc_id"])]
        start = int(row["byte_start"])
        chunk = np.frombuffer(buf[start : start + 64], dtype=np.uint8)
        assert int(row["frame_idx"]) % 2 == 0
        assert int(row["frame_len"]) == len(chunk)
        assert abs(float(row["frame_mean"]) - chunk.astype(np.int64).mean()) < 1e-12


def test_resample_audio_fake_codec(media_df):
    import numpy as np

    pdf = mm.resample_audio(
        media_df, target_hz=3, src_hz=8, codec="fake"
    ).toPandas()
    src = {int(r["doc_id"]): bytes(r["payload"]) for r in media_df.collect()}
    assert len(pdf) == len(src)
    for _, row in pdf.head(25).iterrows():
        x = np.frombuffer(src[int(row["doc_id"])], dtype=np.uint8)
        n_out = (len(x) * 3) // 8
        assert int(row["n_samples_out"]) == n_out
        if n_out == 0:
            assert float(row["mean_out"]) == 0.0
            continue
        idx = (np.arange(n_out) * 8) // 3
        assert abs(float(row["mean_out"]) - x[idx].astype(np.int64).mean()) < 1e-12
