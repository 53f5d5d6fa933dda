"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video ride as ``BinaryType`` columns next to structured
metadata — the standard lakehouse layout for multimodal training data:

    content      BINARY          -- the encoded bytes (or a pointer)
    content_type STRING          -- MIME
    content_sha  STRING          -- content address (dedup / caching key)
    meta         STRUCT<...>     -- per-modality typed metadata

The Spark-side plumbing here (schema, content addressing, Arrow-batched
UDF shape, partition sizing) is real and tested. The actual media decode
is STUBBED — codec libraries (PIL/ffmpeg/librosa) are not in this
container — behind ``decoder=`` hooks: pass a real decoder in production;
the default raises ``NotImplementedError`` and the tests use a
deterministic fake.

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
        "media decode needs a codec library (PIL/ffmpeg); inject decoder="
    )


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
