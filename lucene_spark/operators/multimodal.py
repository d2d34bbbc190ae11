"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns with typed
metadata — the same shape Lucene gives stored binary fields
(``core/document/StoredField.java`` binary ctors; stored-fields chunks in
``core/codecs/lucene90/Lucene90StoredFieldsFormat.java:40-54``). All
Spark-side plumbing here is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning — while the pixel/sample decoding
itself is either delegated to PIL when importable or replaced by a
deterministic fake (this container ships no image/audio libs; see
``decode_images``). Heavy per-byte work runs vectorized over numpy views of
Arrow buffers — never per-row Python.

Scale notes: every op below is embarrassingly parallel over rows (no
shuffle). At 100 TB the only knobs that matter are input split size
(``spark.sql.files.maxPartitionBytes`` — large blobs want bigger splits) and
Arrow batch size (``spark.sql.execution.arrow.maxRecordsPerBatch`` — cap it
so batch_bytes = records x blob_size fits executor memory).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "media_metadata",
    "decode_images",
    "byte_histogram",
    "sample_video_frames",
    "resample_audio",
]

# magic-number sniffing table: (hex prefix, type). Checked in order.
_MAGIC = [
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi/webp container
    ("664C6143", "flac"),
    ("1A45DFA3", "mkv"),  # matroska/webm
]


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column — wholly JVM-side (no UDF).

    Adds: byte_len, content md5, sniffed media type from magic numbers.
    """
    p = F.col(payload_col)
    magic8 = F.hex(F.expr(f"substring({payload_col}, 1, 4)"))
    mtype = F.lit("unknown")
    for prefix, name in reversed(_MAGIC):
        mtype = F.when(magic8.startswith(prefix.upper()), name).otherwise(mtype)
    return df.select(
        *[c for c in df.columns if c != payload_col],
        F.length(p).cast("long").alias("byte_len"),
        F.md5(p).alias("content_md5"),
        mtype.alias("media_type"),
    )


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _fake_decode(buf: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for pixel decoding: pseudo-dimensions from the
    header bytes, mean over the payload bytes. Stable across runs/engines."""
    if not buf:
        return 0, 0, 0, 0.0
    w = buf[0] % 64 + 1
    h = buf[min(1, len(buf) - 1)] % 64 + 1
    c = 3
    arr = np.frombuffer(buf, dtype=np.uint8)
    return w, h, c, float(arr.mean())


def decode_images(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    decoder: str = "auto",
) -> DataFrame:
    """Decode image blobs to (width, height, channels, mean pixel value).

    Real plumbing, pluggable decode: ``decoder="auto"`` uses PIL if
    importable, else the deterministic fake above (this container has no
    imaging libs — the Spark-side schema/batching/partitioning is what this
    op tests); ``decoder="fake"`` forces the deterministic stand-in.
    ``mapInPandas`` streams Arrow batches; per-batch work is a tight loop
    over buffers feeding numpy — no Spark-row-at-a-time Python.
    """
    use_pil = False
    if decoder == "auto":
        try:
            import PIL  # noqa: F401

            use_pil = True
        except ImportError:
            use_pil = False
    elif decoder != "fake":
        raise ValueError(f"decoder must be 'auto' or 'fake', got {decoder!r}")

    if use_pil:
        from PIL import Image
        import io

        def _decode(buf: bytes) -> tuple[int, int, int, float, str]:
            img = Image.open(io.BytesIO(buf))
            arr = np.asarray(img)
            ch = 1 if arr.ndim == 2 else arr.shape[2]
            return img.width, img.height, ch, float(arr.mean()), "pil"

    else:

        def _decode(buf: bytes) -> tuple[int, int, int, float, str]:
            return (*_fake_decode(buf), "fake")

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = [_decode(b) for b in pdf[payload_col]]
            w, h, c, m, dec = zip(*out)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": np.asarray(w, dtype=np.int32),
                    "height": np.asarray(h, dtype=np.int32),
                    "channels": np.asarray(c, dtype=np.int32),
                    "mean_value": np.asarray(m, dtype=np.float64),
                    "decoder": dec,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, schema=DECODE_SCHEMA
    )


N_HIST_BINS = 16


def byte_histogram(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """16-bin byte-value histogram per blob — the feature-extraction shape.

    All blobs in an Arrow batch are histogrammed in ONE numpy pass: the
    batch's buffers concatenate into a single uint8 array, np.add.at
    scatters into a (rows x 16) matrix. This is the pattern a real
    embedding/feature extractor plugs into (swap the histogram for the
    model forward pass over the same concatenated buffer).
    """
    fields = [T.StructField("doc_id", T.LongType())] + [
        T.StructField(f"h{i}", T.LongType()) for i in range(N_HIST_BINS)
    ]
    schema = T.StructType(fields)

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            bufs = list(pdf[payload_col])
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            row_of_byte = np.repeat(np.arange(len(bufs)), lens)
            hist = np.zeros((len(bufs), N_HIST_BINS), dtype=np.int64)
            if len(flat):
                np.add.at(hist, (row_of_byte, flat >> 4), 1)
            out = {"doc_id": pdf[id_col].astype("int64")}
            for i in range(N_HIST_BINS):
                out[f"h{i}"] = hist[:, i]
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(kernel, schema=schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("byte_start", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_mean", T.DoubleType()),
        T.StructField("codec", T.StringType()),
    ]
)


def _pyav_frames(buf: bytes, every_n: int):
    """Real-codec per-blob decode (pyav): every ``every_n``-th video frame
    as (frame_idx, n_pixels, grayscale mean). Import happens here, on the
    executor, so only workers that actually decode need the library."""
    import io

    import av

    out = []
    with av.open(io.BytesIO(buf)) as container:
        for i, frame in enumerate(container.decode(video=0)):
            if i % every_n:
                continue
            arr = np.asarray(frame.to_ndarray(format="gray"), dtype=np.float64)
            out.append((i, int(arr.size), float(arr.mean())))
    return out


def _soundfile_resample(buf: bytes, target_hz: int):
    """Real-codec per-blob resample (soundfile): decode, mono mixdown,
    index-pick downsample to ``target_hz`` using the CONTAINER's sample
    rate. Returns (n_samples_in, n_samples_out, mean_out)."""
    import io

    import soundfile as sf

    data, sr = sf.read(io.BytesIO(buf), dtype="float64")
    mono = data.mean(axis=1) if getattr(data, "ndim", 1) > 1 else np.asarray(data)
    n_in = int(len(mono))
    n_out = int(n_in * target_hz // sr) if sr > 0 else 0
    if n_out:
        idx = (np.arange(n_out, dtype=np.int64) * sr) // target_hz
        mean = float(mono[idx].mean())
    else:
        mean = 0.0
    return n_in, n_out, mean


def sample_video_frames(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    every_n: int = 30, frame_bytes: int = 64, codec: str = "auto",
) -> DataFrame:
    """Sample every ``every_n``-th frame of each video blob (one output row
    per sampled frame — the explode shape a caption/embedding stage
    consumes).

    ``codec="auto"`` resolves to the REAL pyav decoder when the library
    imports (container-decode per blob via :func:`_pyav_frames`, grayscale
    frame means, byte_start = -1 since frames aren't byte-aligned);
    otherwise (this container ships no codecs) the deterministic FAKE
    codec treats the blob as fixed-size ``frame_bytes`` chunks and emits
    each sampled chunk's byte mean — stable across engines, so the op is
    oracle-gated end-to-end. The fake kernel is one numpy pass per Arrow
    batch: all blobs concatenate into a single buffer and frame means
    come from one ``add.reduceat``. The pyav per-blob decode is unit-
    tested against a stub ``av`` module, so the wiring is exercised even
    where the codec library is absent.
    """
    if payload_col not in df.columns:
        raise ValueError(f"missing payload column {payload_col!r}")
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    if frame_bytes < 1:
        raise ValueError("frame_bytes must be >= 1")
    if codec == "auto":
        try:
            import av  # noqa: F401

            codec = "pyav"
        except ImportError:
            codec = "fake"
    if codec not in ("fake", "pyav"):
        raise ValueError(f"codec must be 'auto', 'fake' or 'pyav', got {codec!r}")
    if codec == "pyav":
        def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                rows = []
                for doc_id, buf in zip(
                    pdf[id_col].to_numpy(dtype=np.int64), pdf[payload_col]
                ):
                    for fi, flen, fmean in _pyav_frames(bytes(buf), every_n):
                        rows.append(
                            (int(doc_id), fi, -1, flen, fmean, "pyav")
                        )
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["doc_id", "frame_idx", "byte_start",
                                 "frame_len", "frame_mean", "codec"],
                    )

        return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
            kernel, schema=FRAME_SCHEMA
        )

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            bufs = list(pdf[payload_col])
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            n_frames = -(-lens // frame_bytes)  # ceil; 0 for empty blobs
            flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            doc_ids = pdf[id_col].to_numpy(dtype=np.int64)
            total_frames = int(n_frames.sum())
            if total_frames == 0:
                continue
            # frame table: doc row, frame index within doc
            frame_doc = np.repeat(np.arange(len(bufs)), n_frames)
            starts_out = np.cumsum(n_frames) - n_frames
            frame_idx = np.arange(total_frames) - np.repeat(starts_out, n_frames)
            doc_off = np.cumsum(lens) - lens
            byte_start = doc_off[frame_doc] + frame_idx * frame_bytes
            frame_len = np.minimum(
                lens[frame_doc] - frame_idx * frame_bytes, frame_bytes
            )
            # frame sums via one cumulative pass (boundary-safe across docs)
            csum = np.concatenate(([0], np.cumsum(flat.astype(np.int64))))
            sums = csum[byte_start + frame_len] - csum[byte_start]
            keep = frame_idx % every_n == 0
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids[frame_doc[keep]],
                    "frame_idx": frame_idx[keep],
                    "byte_start": (frame_idx * frame_bytes)[keep],
                    "frame_len": frame_len[keep],
                    "frame_mean": sums[keep] / frame_len[keep].astype(np.float64),
                    "codec": "fake",
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, schema=FRAME_SCHEMA
    )


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples_in", T.LongType()),
        T.StructField("n_samples_out", T.LongType()),
        T.StructField("mean_out", T.DoubleType()),
        T.StructField("codec", T.StringType()),
    ]
)


def resample_audio(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    target_hz: int = 16_000, src_hz: int = 44_100, codec: str = "auto",
) -> DataFrame:
    """Resample audio blobs to ``target_hz`` (downsample by index pick).

    ``codec="auto"`` resolves to the REAL soundfile decoder when the
    library imports (per-blob decode via :func:`_soundfile_resample`:
    mono mixdown, index-pick to the target rate, container sample rate
    trusted over ``src_hz``); otherwise the deterministic FAKE codec
    reads the blob as unsigned 8-bit PCM at ``src_hz`` and picks sample j
    at index floor(j·src/target) — integer-exact, so the op is
    oracle-gated. Emits per-blob output-stream stats (a real pipeline
    would emit the resampled array the same way). The soundfile path is
    unit-tested against a stub module.
    """
    if payload_col not in df.columns:
        raise ValueError(f"missing payload column {payload_col!r}")
    if target_hz < 1:
        raise ValueError("target_hz must be >= 1")
    if target_hz > src_hz:
        raise ValueError("fake codec supports downsampling only (target <= src)")
    if codec == "auto":
        try:
            import soundfile  # noqa: F401

            codec = "soundfile"
        except ImportError:
            codec = "fake"
    if codec not in ("fake", "soundfile"):
        raise ValueError(
            f"codec must be 'auto', 'fake' or 'soundfile', got {codec!r}"
        )
    if codec == "soundfile":
        def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                rows = []
                for doc_id, buf in zip(
                    pdf[id_col].to_numpy(dtype=np.int64), pdf[payload_col]
                ):
                    n_in, n_out, mean = _soundfile_resample(
                        bytes(buf), target_hz
                    )
                    rows.append((int(doc_id), n_in, n_out, mean, "soundfile"))
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "n_samples_in", "n_samples_out",
                             "mean_out", "codec"],
                )

        return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
            kernel, schema=AUDIO_SCHEMA
        )

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, buf in zip(
                pdf[id_col].to_numpy(dtype=np.int64), pdf[payload_col]
            ):
                x = np.frombuffer(buf, dtype=np.uint8)
                n_in = len(x)
                n_out = (n_in * target_hz) // src_hz
                if n_out:
                    idx = (np.arange(n_out, dtype=np.int64) * src_hz) // target_hz
                    mean = float(x[idx].astype(np.int64).sum() / float(n_out))
                else:
                    mean = 0.0
                rows.append((int(doc_id), n_in, int(n_out), mean, "fake"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples_in", "n_samples_out", "mean_out", "codec"],
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, schema=AUDIO_SCHEMA
    )
