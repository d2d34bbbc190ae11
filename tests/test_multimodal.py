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


def test_pyav_frame_decode_with_stub(monkeypatch):
    """The real-codec video path, driven by a stub ``av`` module: frame
    sampling honors every_n, grayscale means computed per frame."""
    import sys
    import types

    import numpy as np

    frames = [np.full((2, 3), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50)]

    class _Frame:
        def __init__(self, arr):
            self.arr = arr

        def to_ndarray(self, format):
            assert format == "gray"
            return self.arr

    class _Container:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video):
            assert video == 0
            return iter(_Frame(a) for a in frames)

    stub = types.ModuleType("av")
    stub.open = lambda fh: _Container()
    monkeypatch.setitem(sys.modules, "av", stub)

    from lucene_spark.operators.multimodal import _pyav_frames

    got = _pyav_frames(b"\x00" * 16, every_n=2)
    assert got == [(0, 6, 10.0), (2, 6, 30.0), (4, 6, 50.0)]


def test_soundfile_resample_with_stub(monkeypatch):
    """The real-codec audio path with a stub ``soundfile``: stereo mixes
    down to mono and the container sample rate drives the index pick."""
    import sys
    import types

    import numpy as np

    stereo = np.stack(
        [np.arange(8, dtype=np.float64), np.arange(8, dtype=np.float64) + 2],
        axis=1,
    )  # mono mixdown = arange(8) + 1

    stub = types.ModuleType("soundfile")
    stub.read = lambda fh, dtype: (stereo, 8)
    monkeypatch.setitem(sys.modules, "soundfile", stub)

    from lucene_spark.operators.multimodal import _soundfile_resample

    n_in, n_out, mean = _soundfile_resample(b"ignored", target_hz=4)
    assert (n_in, n_out) == (8, 4)
    # picked indices: floor(j*8/4) = 0,2,4,6 -> mono values 1,3,5,7
    assert mean == 4.0


def test_codec_auto_resolves_to_fake_without_libs(spark):
    """In this container neither pyav nor soundfile import, so auto ==
    fake and the codec column says so (the honest-fallback contract)."""
    import pandas as pd

    from lucene_spark.operators.multimodal import (
        resample_audio, sample_video_frames,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"\x01\x02\x03\x04" * 8]})
    )
    v = sample_video_frames(df, every_n=1, frame_bytes=8, codec="auto").toPandas()
    assert set(v.codec) == {"fake"}
    a = resample_audio(df, target_hz=2, src_hz=8, codec="auto").toPandas()
    assert set(a.codec) == {"fake"}
