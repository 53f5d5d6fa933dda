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


# -- perceptual hashing + near-dup over image payloads ----------------------
#
# The dedup matrix's third modality (text: minhash/simhash/winnowing;
# embeddings: SemDeDup/IVF; THIS: raw image bytes). aHash/dHash are the
# standard perceptual-hash family (average hash: bit = cell >= mean;
# difference hash: bit = cell < right neighbor): near-identical images
# differ in a few bits, so near-dup pairs are Hamming-close and the
# pigeonhole band trick from SimHash applies unchanged.
#
# All-integer by construction (uint8 cells, integer block means via
# floor division, the mean test as 64*cell >= sum): two engines — or a
# Python replay — can never disagree on a bit. Hashes are returned as
# TWO 32-bit halves (hi, lo) instead of one int64 so bit 63 never
# touches the sign bit in either engine.

def ahash_from_array(img, grid: int = 8) -> tuple[int, int]:
    """Average-hash of an (h, w, c) uint8 array: integer-downsample to
    ``grid x grid`` (block mean by floor division; rows/cols cropped to
    the largest multiple of the block), grayscale via (R+G+B)//3, then
    bit_k = 1 iff grid^2 * cell_k >= sum(cells) — the mean test kept in
    integers. Returns (hi, lo): bits 63..32 and 31..0, row-major from
    bit 0 = cell (0,0)."""
    import numpy as np

    gray = img.astype(np.int64).sum(axis=2) // img.shape[2]
    h, w = gray.shape
    bh, bw = max(h // grid, 1), max(w // grid, 1)
    gh, gw = min(grid, h), min(grid, w)
    blocks = (
        gray[: gh * bh, : gw * bw]
        .reshape(gh, bh, gw, bw)
        .sum(axis=(1, 3))
        // (bh * bw)
    )
    cells = np.zeros((grid, grid), dtype=np.int64)
    cells[:gh, :gw] = blocks
    flat = cells.reshape(-1)
    total = int(flat.sum())
    n = grid * grid
    bits = [1 if n * int(v) >= total else 0 for v in flat]
    lo = sum(b << k for k, b in enumerate(bits[:32]))
    hi = sum(b << k for k, b in enumerate(bits[32:64]))
    return hi, lo


def dhash_from_array(img, grid: int = 8) -> tuple[int, int]:
    """Difference-hash: same integer downsample, bit = 1 iff cell is
    strictly less than its RIGHT neighbor (grid x (grid-1) bits,
    row-major). Robust to global brightness shifts where aHash is
    robust to local noise — the standard complementary pair."""
    import numpy as np

    gray = img.astype(np.int64).sum(axis=2) // img.shape[2]
    h, w = gray.shape
    bh, bw = max(h // grid, 1), max(w // grid, 1)
    gh, gw = min(grid, h), min(grid, w)
    blocks = (
        gray[: gh * bh, : gw * bw]
        .reshape(gh, bh, gw, bw)
        .sum(axis=(1, 3))
        // (bh * bw)
    )
    cells = np.zeros((grid, grid), dtype=np.int64)
    cells[:gh, :gw] = blocks
    bits = [
        1 if cells[r, c] < cells[r, c + 1] else 0
        for r in range(grid)
        for c in range(grid - 1)
    ]
    lo = sum(b << k for k, b in enumerate(bits[:32]))
    hi = sum(b << k for k, b in enumerate(bits[32:]))
    return hi, lo


def image_phash(
    df: DataFrame,
    decoder: Callable[[bytes], object] | None = None,
    kernel: Callable[..., tuple[int, int]] | None = None,
    content_col: str = "content",
    grid: int = 8,
) -> DataFrame:
    """Perceptual hash per image payload as an Arrow-batched
    mapInPandas: ``decoder(bytes) -> (h, w, c) uint8 array`` (default
    the library-free :func:`decode_ppm`; inject for JPEG etc.), then
    ``kernel`` (default :func:`ahash_from_array`). Adds ``phash_hi`` /
    ``phash_lo`` int columns; bytes cross the JVM boundary once per
    Arrow batch and only the 2x32-bit hashes continue downstream."""
    decoder = decoder or decode_ppm
    kernel = kernel or ahash_from_array
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("phash_hi", T.LongType()),
            T.StructField("phash_lo", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [
                kernel(decoder(bytes(b)), grid=grid) if b is not None else (None, None)
                for b in pdf[content_col]
            ]
            pdf["phash_hi"] = [h for h, _ in hashes]
            pdf["phash_lo"] = [lo for _, lo in hashes]
            yield pdf

    return df.mapInPandas(run, out_schema)


def phash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    hi_col: str = "phash_hi",
    lo_col: str = "phash_lo",
    max_distance: int = 6,
    max_band_members: int | None = None,
) -> DataFrame:
    """Hamming-banded near-dup pairs over perceptual hashes: the 64
    bits split into four 16-bit bands; candidate pairs share at least
    one exact band (an equi-join per band — never an all-pairs
    comparison), then the exact Hamming distance
    ``bit_count(hi XOR hi') + bit_count(lo XOR lo')`` filters to
    ``<= max_distance``. Pigeonhole: any pair within distance 3 shares
    a band, so recall is TOTAL there; pairs at 4..max_distance are
    reported when banding happens to catch them (same contract as the
    SimHash pigeonhole family, and the oracle replays the identical
    banding so the semantics are engine-exact).

    Scale: shuffles are (band_value, id, hash) projections keyed per
    band; hot bands (e.g. all-black thumbnails) behave like SimHash's
    hot buckets, and candidate pairs grow Σn(n−1)/2 over band-bucket
    sizes — quadratic in the hottest bucket. ``max_band_members`` is
    the mechanical valve (round-10 scale probe: a self-similar 50k-doc
    corpus pushed the video variant >100× past linear growth): buckets
    with more members are EXCLUDED from candidate generation, which
    narrows the recall guarantee to pairs sharing at least one
    non-hot band — the standard LSH over-full-bucket skip; a bucket
    that hot means the band carries no discriminating information
    for those members anyway. ``None`` (default) keeps the exact
    uncapped semantics the oracle queries replay. The hash frame is
    persisted before the self-join (both sides consume it; without
    the boundary the whole upstream decode+hash pipeline executes
    twice — the ngram_jaccard_pairs materialize rule). Output:
    (id_a, id_b, hamming), id_a < id_b, each pair once."""
    from moisturizer_spark.operators.common import materialize

    df = materialize(df.select(id_col, hi_col, lo_col))
    bands = df.select(
        F.col(id_col).alias("_id"),
        F.col(hi_col).alias("_hi"),
        F.col(lo_col).alias("_lo"),
        (F.col(lo_col) % F.lit(65536)).alias("_b0"),
        (F.col(lo_col) / F.lit(65536)).cast("bigint").alias("_b1"),
        (F.col(hi_col) % F.lit(65536)).alias("_b2"),
        (F.col(hi_col) / F.lit(65536)).cast("bigint").alias("_b3"),
    )
    melted = bands.select(
        "_id",
        "_hi",
        "_lo",
        F.posexplode(
            F.array(F.col("_b0"), F.col("_b1"), F.col("_b2"), F.col("_b3"))
        ).alias("_band", "_val"),
    )
    if max_band_members is not None:
        # one combinable count per bucket, window-free: the hot-bucket
        # filter joins bucket sizes back (bucket-count-sized frame)
        sizes = melted.groupBy("_band", "_val").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        melted = (
            melted.join(sizes, ["_band", "_val"])
            .filter(F.col("_bn") <= F.lit(max_band_members))
            .drop("_bn")
        )
    left = melted.select(
        F.col("_id").alias("id_a"),
        F.col("_hi").alias("_hi_a"),
        F.col("_lo").alias("_lo_a"),
        "_band",
        "_val",
    )
    right = melted.select(
        F.col("_id").alias("id_b"),
        F.col("_hi").alias("_hi_b"),
        F.col("_lo").alias("_lo_b"),
        "_band",
        "_val",
    )
    cand = (
        left.join(right, ["_band", "_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_hi_a", "_lo_a", "_hi_b", "_lo_b")
        .distinct()
    )
    ham = (
        F.bit_count(F.expr("_hi_a ^ _hi_b"))
        + F.bit_count(F.expr("_lo_a ^ _lo_b"))
    ).cast("int")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= F.lit(max_distance))
        .select("id_a", "id_b", "hamming")
    )


def wav_energy_hash(decoded, grid: int = 8) -> tuple[int, int]:
    """Audio fingerprint kernel over :func:`decode_wav` output — the
    audio analog of :func:`ahash_from_array`, shaped to plug into
    :func:`image_phash`'s ``kernel=`` slot (``grid=64`` for the full
    64-bit signature): integer downmix, ``grid`` CONTIGUOUS frames of
    ``m = max(n_samples // grid, 1)`` samples (tail beyond ``grid*m``
    cropped; frames past a short clip's end are zero), per-frame
    energy = plain integer sample sum, and the same all-integer mean
    test ``grid * e_k >= total``. Robust to small edits the way aHash
    is: a changed sample nudges one frame's energy, flipping at most a
    few bits. Returns (hi, lo) 32-bit halves."""
    import numpy as np

    _rate, data = decoded
    x = data.astype(np.int64).sum(axis=1) // data.shape[1]
    n = len(x)
    m = max(n // grid, 1)
    usable = min(n, grid * m)
    e = [
        int(x[k * m : min((k + 1) * m, usable)].sum())
        for k in range(grid)
    ]
    total = sum(e)
    bits = [1 if grid * v >= total else 0 for v in e]
    lo = sum(b << k for k, b in enumerate(bits[:32]))
    hi = sum(b << k for k, b in enumerate(bits[32:64]))
    return hi, lo


# -- persisted perceptual-hash index (build / query / append) ---------------
#
# The minhash_build/ivf_build analog for media: the index is the tiny
# (id, phash_hi, phash_lo) table plus a sidecar pinning the decode
# kernel and distance threshold, so batch jobs AND a streaming stage
# dedup incoming media against everything the corpus already absorbed
# — without re-decoding a single stored byte (hashes ARE the index).

PHASH_KERNELS = {
    "ppm_ahash": ("decode_ppm", "ahash_from_array", 8),
    "ppm_dhash": ("decode_ppm", "dhash_from_array", 8),
    "wav_energy": ("decode_wav", "wav_energy_hash", 64),
}


def _resolve_kernel(name: str):
    import moisturizer_spark.operators.multimodal as M

    dec, ker, grid = PHASH_KERNELS[name]
    return getattr(M, dec), getattr(M, ker), grid


def _hash_media(media: DataFrame, meta: dict) -> DataFrame:
    """Hash a media frame under a sidecar's pinned parameters: single
    ``(id, phash_hi, phash_lo)`` rows for image/audio kernels, or
    frame-indexed ``(id, frame_idx, phash_hi, phash_lo)`` rows when the
    sidecar pins ``frame_bytes`` (fixed-size-frame video). The ONE
    hashing entry point shared by build/query/append and the streaming
    pipeline so none of them can drift from the index's semantics."""
    decoder, ker, grid = _resolve_kernel(meta["kernel"])
    cols = media.select(meta["id_col"], meta["content_col"])
    if meta.get("frame_bytes"):
        return video_phash(
            cols,
            meta["frame_bytes"],
            decoder=decoder,
            kernel=ker,
            content_col=meta["content_col"],
            id_col=meta["id_col"],
            grid=grid,
        )
    return image_phash(
        cols,
        decoder=decoder,
        kernel=ker,
        content_col=meta["content_col"],
        grid=grid,
    ).select(meta["id_col"], "phash_hi", "phash_lo")


def phash_build(
    media: DataFrame,
    path: str,
    kernel: str = "ppm_ahash",
    id_col: str = "doc_id",
    content_col: str = "content",
    max_distance: int = 6,
    frame_bytes: int | None = None,
) -> dict:
    """Hash a media corpus and persist the perceptual-hash index:
    ``<path>/data/*.parquet`` holding (id, phash_hi, phash_lo) — bytes
    are decoded ONCE, at build — plus ``<path>/_phash.json`` pinning
    the kernel name, grid, and distance threshold so every later
    query/append/stream uses identical semantics (the sidecar-pins-
    the-params rule from the MinHash index).

    ``frame_bytes`` builds a VIDEO index instead: payloads split into
    fixed-size frames (:func:`fixed_frame_splitter`), rows are
    frame-indexed, and queries apply the all-frames-match contract of
    :func:`video_near_duplicates`."""
    import json
    import os

    _, _, grid = _resolve_kernel(kernel)
    meta = {
        "kernel": kernel,
        "grid": grid,
        "id_col": id_col,
        "content_col": content_col,
        "max_distance": max_distance,
        "data_dir": "data",
        "compaction_gen": 0,
    }
    if frame_bytes:
        meta["frame_bytes"] = frame_bytes
    _hash_media(media, meta).write.mode("overwrite").parquet(
        os.path.join(path, "data")
    )
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "_phash.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_phash.json"))
    # rebuilding over a previously COMPACTED index: the old sidecar
    # pointed at data_g{n}, which nothing can reach once the sidecar
    # above says "data" — remove stranded generations, don't leak them.
    # Cleanup strictly AFTER the atomic swap (ADVICE r08 medium): with
    # the old order, a crash in the delete window — or a concurrent
    # reader holding the old sidecar — left _phash.json pointing at a
    # deleted directory, a bricked index. phash_compact already does
    # swap-then-delete; this mirrors it.
    import shutil

    for entry in os.listdir(path):
        if entry.startswith("data_g"):
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)
    return meta


def _phash_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "_phash.json")) as fh:
        return json.load(fh)


def phash_query(spark, path: str, media: DataFrame) -> DataFrame:
    """Near-dups of a media batch AGAINST the persisted index: decode
    + hash the batch (its bytes only — stored corpus bytes never
    re-decode), then the banded Hamming join between batch hashes and
    index hashes under the sidecar's threshold. Returns
    ``(batch_id, corpus_id, hamming)``; for a frame-indexed (video)
    index, ``hamming`` is the MAX per-frame distance and a match
    requires every corresponding frame pair to qualify
    (:func:`video_near_duplicates`' all-frames contract)."""
    import os

    meta = _phash_meta(path)
    qh = _hash_media(media, meta)
    idx = spark.read.parquet(os.path.join(path, meta.get("data_dir", "data")))
    if meta.get("frame_bytes"):
        return _frame_indexed_query(qh, idx, meta)
    q = qh.select(
        F.col(meta["id_col"]).alias("batch_id"),
        F.col("phash_hi").alias("_qhi"),
        F.col("phash_lo").alias("_qlo"),
    )
    c = idx.select(
        F.col(meta["id_col"]).alias("corpus_id"),
        F.col("phash_hi").alias("_chi"),
        F.col("phash_lo").alias("_clo"),
    )

    def bands(df, hi, lo, side):
        return df.select(
            "*",
            F.posexplode(
                F.array(
                    (F.col(lo) % 65536),
                    (F.col(lo) / 65536).cast("bigint"),
                    (F.col(hi) % 65536),
                    (F.col(hi) / 65536).cast("bigint"),
                )
            ).alias(f"_band_{side}", f"_val_{side}"),
        )

    qb = bands(q, "_qhi", "_qlo", "q")
    cb = bands(c, "_chi", "_clo", "c")
    ham = (
        F.bit_count(F.expr("_qhi ^ _chi")) + F.bit_count(F.expr("_qlo ^ _clo"))
    ).cast("int")
    return (
        qb.join(
            cb,
            (F.col("_band_q") == F.col("_band_c"))
            & (F.col("_val_q") == F.col("_val_c")),
        )
        .select("batch_id", "corpus_id", "_qhi", "_qlo", "_chi", "_clo")
        .distinct()
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= F.lit(meta["max_distance"]))
        # self-pairs out (minhash_query parity): a replayed streaming
        # batch whose hashes already landed in the index must not count
        # its own rows as corpus duplicates
        .filter(F.col("batch_id") != F.col("corpus_id"))
        .select("batch_id", "corpus_id", "hamming")
    )


def _frame_indexed_query(
    qh: DataFrame, idx: DataFrame, meta: dict
) -> DataFrame:
    """Video leg of :func:`phash_query`: banded candidacy with the
    frame index IN the band key (only corresponding frames compare —
    the pairs×frames² guard from :func:`video_near_duplicates`), then
    the exact all-frames check joining both sides' hashes on frame_idx
    and requiring the matched-frame count to equal BOTH videos' frame
    counts with max per-frame distance ≤ the sidecar threshold.
    Shuffles carry 4 band rows per frame, never pixels."""
    from moisturizer_spark.operators.common import materialize

    id_col = meta["id_col"]
    # query side dedups too: an at-least-once upstream can deliver the
    # same probe rows twice in one micro-batch, and a raw _nq row count
    # would be 2x the frame count — every true duplicate of that probe
    # then silently fails the all-frames check (the same failure class
    # as the corpus-side fix below, on the other side of the join)
    q = materialize(
        qh.select(
            F.col(id_col).alias("batch_id"),
            F.col("frame_idx").alias("_f"),
            F.col("phash_hi").alias("_hi"),
            F.col("phash_lo").alias("_lo"),
        ).dropDuplicates(["batch_id", "_f", "_hi", "_lo"])
    )
    # a replayed streaming append leaves exact duplicate frame rows;
    # the image leg collapses them via the candidate DISTINCT, but the
    # all-frames count check here would see _n = 2·_nq and silently
    # DROP a true duplicate — dedup the corpus side first (compaction
    # sheds the rows physically; this keeps queries correct meanwhile)
    c = idx.select(
        F.col(id_col).alias("corpus_id"),
        F.col("frame_idx").alias("_f"),
        F.col("phash_hi").alias("_hi"),
        F.col("phash_lo").alias("_lo"),
    ).dropDuplicates(["corpus_id", "_f", "_hi", "_lo"])

    def bands(df, keep):
        return df.select(
            keep,
            "_f",
            F.posexplode(
                F.array(
                    F.col("_lo") % F.lit(65536),
                    (F.col("_lo") / F.lit(65536)).cast("bigint"),
                    F.col("_hi") % F.lit(65536),
                    (F.col("_hi") / F.lit(65536)).cast("bigint"),
                )
            ).alias("_band", "_val"),
        )

    cand = (
        bands(q, "batch_id")
        .join(bands(c, "corpus_id"), ["_f", "_band", "_val"])
        .select("batch_id", "corpus_id")
        .distinct()
    )
    nq = q.groupBy("batch_id").agg(F.count_distinct("_f").alias("_nq"))
    # DISTINCT FRAME count, not frame×hash row count: an id re-appended
    # with DIFFERENT content keeps both hash generations (compaction
    # intentionally preserves them), and a row count would inflate past
    # any possible match size — every true duplicate of that id then
    # goes silently unreported (ADVICE r08). Per-frame the MIN distance
    # across generations below makes such ids match probes near EITHER
    # stored generation instead.
    nc = c.groupBy("corpus_id").agg(
        F.count_distinct("_f").alias("_nc")
    )
    a = q.select(
        "batch_id", "_f",
        F.col("_hi").alias("_hi_a"), F.col("_lo").alias("_lo_a"),
    )
    b = c.select(
        "corpus_id", "_f",
        F.col("_hi").alias("_hi_b"), F.col("_lo").alias("_lo_b"),
    )
    dist = (
        F.bit_count(F.expr("_hi_a ^ _hi_b"))
        + F.bit_count(F.expr("_lo_a ^ _lo_b"))
    ).cast("int")
    pf = (
        cand.join(a, "batch_id")
        .join(b, ["corpus_id", "_f"])
        .select("batch_id", "corpus_id", "_f", dist.alias("_d"))
        # best generation per frame first, then the all-frames max:
        # hamming = max over frames of (min over stored generations)
        .groupBy("batch_id", "corpus_id", "_f")
        .agg(F.min("_d").alias("_fd"))
        .groupBy("batch_id", "corpus_id")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.max("_fd").alias("hamming"),
        )
    )
    return (
        pf.join(nq, "batch_id")
        .join(nc, "corpus_id")
        .filter(
            (F.col("_n") == F.col("_nq"))
            & (F.col("_n") == F.col("_nc"))
            & (F.col("hamming") <= F.lit(meta["max_distance"]))
            # self-pairs out (minhash_query parity; replay convergence)
            & (F.col("batch_id") != F.col("corpus_id"))
        )
        .select("batch_id", "corpus_id", "hamming")
    )


def phash_append(spark, path: str, media: DataFrame) -> None:
    """Hash a new media batch with the sidecar's pinned kernel and
    append the (id, hash) rows — the index grows without rewriting or
    re-decoding anything stored."""
    import os

    meta = _phash_meta(path)
    _hash_media(media, meta).write.mode("append").parquet(
        os.path.join(path, meta.get("data_dir", "data"))
    )


def phash_compact(spark, path: str) -> dict:
    """Compact a persisted perceptual-hash index after many appends —
    the same small-file healing step :func:`minhash_compact
    <moisturizer_spark.operators.dedup.minhash_compact>` and
    ``ivf_compact`` give the other two persisted indexes: each
    :func:`phash_append` adds ~shuffle-partitions files, and a replayed
    streaming append (:mod:`moisturizer_spark.streaming.media_dedup`)
    can leave exact duplicate (id, hash) rows that queries collapse via
    DISTINCT but that otherwise persist physically forever.

    Rewrites the hash table into a fresh generation directory
    (``data_g{n}``) with exact replay duplicates shed — an id
    re-appended with DIFFERENT content keeps both hash rows rather than
    arbitrarily dropping one — then atomically swaps the sidecar to
    point at it (temp file + ``os.replace``) and removes the old
    generation. Readers resolve the directory through the sidecar, so a
    reader holding the OLD sidecar finishes against the old files; the
    swap assumes the index's single-writer discipline (same as append).
    Returns the updated metadata dict.
    """
    import json
    import os
    import shutil

    meta = _phash_meta(path)
    gen = meta.get("compaction_gen", 0) + 1
    old_dir = meta.get("data_dir", "data")
    new_dir = f"data_g{gen}"
    keys = [meta["id_col"], "phash_hi", "phash_lo"]
    if meta.get("frame_bytes"):
        keys.append("frame_idx")
    spark.read.parquet(os.path.join(path, old_dir)).dropDuplicates(
        keys
    ).repartition("phash_hi").write.mode("overwrite").parquet(
        os.path.join(path, new_dir)
    )
    meta.update({"data_dir": new_dir, "compaction_gen": gen})
    tmp = os.path.join(path, "_phash.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_phash.json"))
    shutil.rmtree(os.path.join(path, old_dir), ignore_errors=True)
    return meta


def resize_image_array(img, out_h: int, out_w: int):
    """Integer box-filter resize of an (h, w, c) uint8 array to
    (out_h, out_w, c): each output pixel is the floor-mean of its
    source box (boxes from integer edge splits ``r*h//out_h``), so the
    result is deterministic across platforms — no float interpolation,
    no SIMD-order effects. Upscaling repeats pixels (boxes of size 1).
    Per-output-pixel numpy box sums: the deterministic REFERENCE
    implementation — swap a reshape-based kernel in at the same call
    site when output sizes grow past thumbnails and shapes divide
    evenly."""
    import numpy as np

    h, w, c = img.shape
    out = np.zeros((out_h, out_w, c), dtype=np.uint8)
    src = img.astype(np.int64)
    for r in range(out_h):
        r0, r1 = r * h // out_h, max((r + 1) * h // out_h, r * h // out_h + 1)
        for cc in range(out_w):
            c0 = cc * w // out_w
            c1 = max((cc + 1) * w // out_w, c0 + 1)
            box = src[r0:r1, c0:c1]
            out[r, cc] = box.sum(axis=(0, 1)) // box[:, :, 0].size
    return out


def resize_images(
    df: DataFrame,
    out_h: int,
    out_w: int,
    decoder: Callable[[bytes], object] | None = None,
    content_col: str = "content",
    out_col: str = "resized",
) -> DataFrame:
    """Batch image resize as Arrow-batched mapInPandas: decode (default
    the library-free :func:`decode_ppm`; inject for codec formats),
    integer box-filter resize (:func:`resize_image_array`), re-encode
    as a raw PPM (P6) payload in ``out_col`` — the
    normalize-before-embedding step of a multimodal training pipeline.
    Output payloads are fixed-size (``3*out_h*out_w`` + header), which
    is what makes downstream batching/packing predictable. Bytes cross
    the JVM boundary once per Arrow batch, each way."""
    decoder = decoder or decode_ppm
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )
    header = f"P6\n{out_w} {out_h}\n255\n".encode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for b in pdf[content_col]:
                if b is None:
                    outs.append(None)
                    continue
                small = resize_image_array(decoder(bytes(b)), out_h, out_w)
                outs.append(header + small.tobytes())
            pdf[out_col] = outs
            yield pdf

    return df.mapInPandas(run, out_schema)


# -- video: fixed-size frame streams -> per-frame phash -> near-dup ---------
#
# Video is the modality where row SIZE explodes into row COUNT: a
# payload is a stream of frames, and every per-image tool applies
# per frame. The pieces compose the existing machinery — sample_frames
# is the splitter stage, image_phash the per-frame kernel, and the
# banded Hamming join gains the frame index in its key so only
# corresponding frames ever compare.


def fixed_frame_splitter(frame_bytes: int) -> Callable[[bytes], list[bytes]]:
    """Splitter for raw fixed-size-frame streams (uncompressed
    YUV/RGB-style containers) in the codec-hook shape
    :func:`sample_frames` expects. A trailing partial chunk is an
    unfinished frame and is dropped. Real containers (MP4 etc.) inject
    their own splitter — same contract, no library dependency here."""
    if frame_bytes <= 0:
        raise ValueError(f"frame_bytes must be positive, got {frame_bytes}")

    def split(content: bytes) -> list[bytes]:
        n = len(content) // frame_bytes
        return [
            content[i * frame_bytes:(i + 1) * frame_bytes] for i in range(n)
        ]

    return split


def video_phash(
    df: DataFrame,
    frame_bytes: int,
    decoder: Callable[[bytes], object] | None = None,
    kernel: Callable[..., tuple[int, int]] | None = None,
    content_col: str = "content",
    id_col: str = "doc_id",
    grid: int = 8,
) -> DataFrame:
    """Per-frame perceptual hashes of a fixed-size-frame video column:
    :func:`sample_frames` (frame explosion, Arrow-batched) →
    :func:`image_phash` per frame. Returns ``(id, frame_idx,
    phash_hi, phash_lo)`` — frame bytes never survive past the hash
    stage, so downstream shuffles carry 2×32 bits per frame."""
    frames = sample_frames(
        df,
        splitter=fixed_frame_splitter(frame_bytes),
        content_col=content_col,
        id_col=id_col,
    )
    hashed = image_phash(
        frames, decoder=decoder, kernel=kernel, content_col="frame",
        grid=grid,
    )
    return hashed.select(id_col, "frame_idx", "phash_hi", "phash_lo")


def video_near_duplicates(
    frame_hashes: DataFrame,
    id_col: str = "doc_id",
    max_distance: int = 6,
    max_band_members: int | None = None,
) -> DataFrame:
    """Video near-dup pairs: two videos are near-duplicates iff they
    have the SAME frame count and EVERY corresponding frame pair is
    within ``max_distance`` Hamming bits — the all-scenes-match
    contract (a clip sharing one scene with a longer cut is related
    content, not a duplicate).

    Candidates come from the image family's 16-bit banding with the
    FRAME INDEX added to the band key, so only corresponding frames
    compare. Recall: a qualifying pair has every frame within
    ``max_distance``; whenever any of its frames lies within distance
    3, that frame band-matches (pigeonhole over four 16-bit bands) and
    surfaces the pair — total recall for pairs with at least one
    ≤3-distance frame, the per-frame contract of
    :func:`phash_near_duplicates` lifted to videos. After candidacy
    the exact check joins both sides' frame hashes on frame_idx and
    keeps pairs whose matched-frame count equals BOTH videos' frame
    counts (an inner join can only lose frames, never invent them)
    with max distance ≤ threshold.

    Scale: shuffles carry (frame_idx, band, val, id, hash) rows —
    4·n_frames rows per video, never pixels; the exact check joins the
    persisted hash frame twice, keyed on id — pair-count sized. Hot
    band values (e.g. the all-ones hash of blank frames) behave like
    SimHash hot buckets and candidate pairs grow Σn(n−1)/2 over
    (frame, band, val) bucket sizes — the round-10 sf1 scale probe
    measured a self-similar 50k-video corpus at >100× linear growth
    here. ``max_band_members`` is the valve: over-full buckets are
    skipped (recall narrows to pairs sharing a non-hot frame-band —
    the standard LSH over-full-bucket skip); ``None`` keeps the exact
    uncapped semantics the oracle replays. Output: (id_a, id_b,
    n_frames, max_hamming), id_a < id_b, each pair once."""
    from moisturizer_spark.operators.common import materialize

    h = materialize(
        frame_hashes.select(
            F.col(id_col).alias("_id"),
            F.col("frame_idx").alias("_f"),
            F.col("phash_hi").alias("_hi"),
            F.col("phash_lo").alias("_lo"),
        )
    )
    nf = h.groupBy("_id").agg(F.count(F.lit(1)).alias("_nf"))
    melted = h.select(
        "_id",
        "_f",
        F.posexplode(
            F.array(
                F.col("_lo") % F.lit(65536),
                (F.col("_lo") / F.lit(65536)).cast("bigint"),
                F.col("_hi") % F.lit(65536),
                (F.col("_hi") / F.lit(65536)).cast("bigint"),
            )
        ).alias("_band", "_val"),
    )
    if max_band_members is not None:
        sizes = melted.groupBy("_f", "_band", "_val").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        melted = (
            melted.join(sizes, ["_f", "_band", "_val"])
            .filter(F.col("_bn") <= F.lit(max_band_members))
            .drop("_bn")
        )
    cand = (
        melted.select(F.col("_id").alias("id_a"), "_f", "_band", "_val")
        .join(
            melted.select(F.col("_id").alias("id_b"), "_f", "_band", "_val"),
            ["_f", "_band", "_val"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = h.select(
        F.col("_id").alias("id_a"),
        "_f",
        F.col("_hi").alias("_hi_a"),
        F.col("_lo").alias("_lo_a"),
    )
    b = h.select(
        F.col("_id").alias("id_b"),
        "_f",
        F.col("_hi").alias("_hi_b"),
        F.col("_lo").alias("_lo_b"),
    )
    dist = (
        F.bit_count(F.expr("_hi_a ^ _hi_b"))
        + F.bit_count(F.expr("_lo_a ^ _lo_b"))
    ).cast("int")
    # the frame index is IN both join keys: joining on ids alone would
    # build pairs x n_frames^2 intermediate rows before a frame filter
    # — quadratic in video length exactly where long videos hurt
    pf = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "_f"])
        .select("id_a", "id_b", dist.alias("_d"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("_d").alias("max_hamming"),
        )
    )
    return (
        pf.join(nf.select(F.col("_id").alias("id_a"),
                          F.col("_nf").alias("_na")), "id_a")
        .join(nf.select(F.col("_id").alias("id_b"),
                        F.col("_nf").alias("_nb")), "id_b")
        .filter(
            (F.col("n_frames") == F.col("_na"))
            & (F.col("n_frames") == F.col("_nb"))
            & (F.col("max_hamming") <= F.lit(max_distance))
        )
        .select("id_a", "id_b", "n_frames", "max_hamming")
    )
