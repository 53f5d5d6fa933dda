"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride as ``BinaryType`` columns next to structured
metadata — the standard lakehouse layout for multimodal training data:

    content      BINARY          -- the encoded bytes (or a pointer)
    content_type STRING          -- MIME
    content_sha  STRING          -- content address (dedup / caching key)
    meta         STRUCT<...>     -- per-modality typed metadata

The Spark-side plumbing here (schema, content addressing, Arrow-batched
UDF shape, partition sizing) is real and tested. Decode comes in two
tiers:

- **Real decoders for library-free formats**: binary PPM (P6) images and
  PCM WAV audio parse with numpy + the stdlib alone —
  :func:`decode_ppm` / :func:`decode_wav` and the feature extractors
  built on them (:func:`ppm_features`, :func:`wav_features`) are fully
  implemented and round-trip-tested.
- **Codec-library formats** (JPEG/MP4/FLAC …) stay behind ``decoder=``
  hooks: PIL/ffmpeg/librosa are not in this container, so the default
  raises ``NotImplementedError`` and tests inject deterministic fakes.

Scale notes: binary payloads make *row size*, not row count, the planning
unit — ``maxPartitionBytes`` governs scan parallelism, and explode-style
ops (frame sampling) should land after a repartition so the fan-out
doesn't skew. Feature extraction is mapInPandas so bytes cross the
JVM↔Python boundary once per batch via Arrow, not per row.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)

AUDIO_META = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def add_content_address(
    df: DataFrame, content_col: str = "content", out_col: str = "content_sha"
) -> DataFrame:
    """sha2-256 of the bytes, JVM-side — the dedup/caching key. Exact
    binary dedup is then a groupBy on this column (shuffles 32-byte
    hashes, never the payloads)."""
    return df.withColumn(out_col, F.sha2(F.col(content_col), 256))


def dedup_by_content(
    df: DataFrame, content_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per distinct payload (min id representative)."""
    from moisturizer_spark.operators.dedup import exact_dedup

    return exact_dedup(
        add_content_address(df, content_col), key_cols=["content_sha"], id_col=id_col
    )


def _not_implemented_decoder(content: bytes):  # pragma: no cover
    raise NotImplementedError(
        "media decode needs a codec library (PIL/ffmpeg); inject decoder= "
        "(or use the built-in decode_ppm/decode_wav for those formats)"
    )


def decode_ppm(content: bytes):
    """Decode a binary PPM (P6) image to an (h, w, 3) uint8 numpy array.

    Pure bytes + numpy — no codec library. Handles the full header
    grammar: '#' comments and arbitrary whitespace between the magic,
    dimensions, and maxval tokens."""
    import numpy as np

    if not content.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # tokenize the header: magic, width, height, maxval; comments run to EOL
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(content):
        c = content[i : i + 1]
        if c == b"#":
            i = content.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(content) and not content[j : j + 1].isspace():
                j += 1
            tokens.append(content[i:j])
            i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    i += 1  # exactly one whitespace byte separates header from raster
    raster = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def ppm_features(content: bytes) -> list[float]:
    """8-dim image features from a PPM payload: (w, h, channels,
    mean R/G/B, global std, edge energy via row-difference mean)."""
    import numpy as np

    img = decode_ppm(content).astype(np.float64)
    h, w, _ = img.shape
    means = img.mean(axis=(0, 1))
    edge = float(np.abs(np.diff(img, axis=0)).mean()) if h > 1 else 0.0
    return [
        float(w), float(h), 3.0,
        float(means[0]), float(means[1]), float(means[2]),
        float(img.std()), edge,
    ]


def decode_wav(content: bytes):
    """Decode PCM WAV bytes to (sample_rate, (n_samples, n_channels)
    int numpy array). stdlib ``wave`` + numpy — no codec library.
    Supports 8/16/32-bit integer PCM."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content), "rb") as wf:
        rate = wf.getframerate()
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    data = np.frombuffer(frames, dtype=dtype).reshape(-1, n_ch)
    return rate, data


def wav_features(content: bytes) -> list[float]:
    """8-dim audio features from a WAV payload: (sample_rate, n_samples,
    n_channels, duration_s, rms, peak, zero-crossing rate, DC offset)."""
    import numpy as np

    rate, data = decode_wav(content)
    x = data.astype(np.float64).mean(axis=1)  # downmix
    n = len(x)
    zc = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if n > 1 else 0.0
    return [
        float(rate), float(n), float(data.shape[1]), n / rate,
        float(np.sqrt((x ** 2).mean())) if n else 0.0,
        float(np.abs(x).max()) if n else 0.0,
        zc, float(x.mean()) if n else 0.0,
    ]


def extract_features(
    df: DataFrame,
    extractor: Callable[[bytes], list[float]] | None = None,
    content_col: str = "content",
    out_col: str = "features",
    dim: int = 8,
) -> DataFrame:
    """Per-payload feature extraction as an Arrow-batched mapInPandas.

    ``extractor(bytes) -> list[float]`` runs inside the Python worker on
    whole Arrow batches of rows; the default stub raises (no codecs in
    this container) — tests inject a deterministic fake.
    """
    extractor = extractor or _not_implemented_decoder
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = [
                extractor(bytes(b)) if b is not None else None
                for b in pdf[content_col]
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    splitter: Callable[[bytes], list[bytes]] | None = None,
    content_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video → frame rows (one row per sampled frame).

    ``splitter(bytes) -> list[bytes]`` is the codec hook (stubbed).
    Output: (id, frame_idx, frame BINARY). Explodes row *size* into row
    *count*; callers should repartition before heavy downstream work.
    """
    splitter = splitter or _not_implemented_decoder
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None:
                    continue
                for i, frame in enumerate(splitter(bytes(content))):
                    rows.append({id_col: rid, "frame_idx": i, "frame": frame})
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return df.select(id_col, content_col).mapInPandas(run, out_schema)
