"""Multimodal binary-column plumbing tests (decode stubbed by design)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F, types as T

from moisturizer_spark.operators.multimodal import (
    add_content_address,
    dedup_by_content,
    extract_features,
    sample_frames,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
    ]
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, b"\x89PNG-fake-one", "image/png"),
        (2, b"\x89PNG-fake-two", "image/png"),
        (3, b"\x89PNG-fake-one", "image/png"),  # exact dup of 1
        (4, None, "image/png"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_content_address_is_deterministic_sha(media):
    out = {r["doc_id"]: r["content_sha"] for r in add_content_address(media).collect()}
    assert out[1] == out[3] != out[2]
    assert len(out[1]) == 64


def test_dedup_by_content(media):
    kept = sorted(r["doc_id"] for r in dedup_by_content(media.filter("content IS NOT NULL")).collect())
    assert kept == [1, 2]  # min-id representative per payload


def test_extract_features_arrow_batch_shape(media):
    def fake_extractor(content: bytes):
        return [float(len(content)), float(content[0])]

    out = extract_features(media, extractor=fake_extractor, dim=2)
    rows = {r["doc_id"]: r["features"] for r in out.collect()}
    assert rows[1] == [13.0, 137.0]
    assert rows[4] is None  # null payload passes through as null features
    assert out.schema["features"].dataType == T.ArrayType(T.FloatType())


def test_extract_features_default_stub_raises(media):
    with pytest.raises(Exception) as exc_info:
        extract_features(media).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_sample_frames(media):
    def fake_splitter(content: bytes):
        return [content[:4], content[4:8]]

    frames = sample_frames(media, splitter=fake_splitter)
    got = frames.filter(F.col("doc_id") == 1).orderBy("frame_idx").collect()
    assert [bytes(r["frame"]) for r in got] == [b"\x89PNG", b"-fak"]
    # null-payload rows produce no frames
    assert frames.filter(F.col("doc_id") == 4).count() == 0


# -- real decoders (library-free formats) -------------------------------------


def _make_ppm(w, h, comment=False):
    import numpy as np

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    header = b"P6\n"
    if comment:
        header += b"# a comment line\n"
    header += f"{w} {h}\n255\n".encode()
    return header + img.tobytes(), img


def _make_wav(rate=8000, n=1600, ch=1):
    import io
    import wave

    import numpy as np

    t = np.arange(n) / rate
    x = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    data = np.repeat(x[:, None], ch, axis=1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(data.tobytes())
    return buf.getvalue(), data


def test_decode_ppm_roundtrip_and_comments():
    import numpy as np

    from moisturizer_spark.operators.multimodal import decode_ppm

    payload, img = _make_ppm(5, 4, comment=True)
    out = decode_ppm(payload)
    assert out.shape == (4, 5, 3)
    assert np.array_equal(out, img)


def test_decode_wav_roundtrip():
    import numpy as np

    from moisturizer_spark.operators.multimodal import decode_wav

    payload, data = _make_wav(rate=8000, n=1600, ch=2)
    rate, out = decode_wav(payload)
    assert rate == 8000
    assert out.shape == (1600, 2)
    assert np.array_equal(out, data)


def test_real_feature_extraction_through_spark(spark):
    """End-to-end: PPM and WAV payloads as binary columns, features
    extracted via the Arrow mapInPandas path with the REAL decoders."""
    import numpy as np

    from moisturizer_spark.operators.multimodal import (
        extract_features,
        ppm_features,
        wav_features,
    )

    ppm, img = _make_ppm(6, 2)
    df = spark.createDataFrame([(1, bytearray(ppm))], "doc_id long, content binary")
    feats = extract_features(df, extractor=ppm_features).first()["features"]
    assert feats[:3] == [6.0, 2.0, 3.0]
    assert abs(feats[3] - img[:, :, 0].mean()) < 0.01

    wav, _ = _make_wav(rate=4000, n=800)
    df2 = spark.createDataFrame([(2, bytearray(wav))], "doc_id long, content binary")
    f2 = extract_features(df2, extractor=wav_features).first()["features"]
    assert f2[0] == 4000.0 and f2[1] == 800.0
    assert abs(f2[3] - 0.2) < 1e-6  # 800 samples at 4 kHz = 0.2 s


# -- perceptual hashing (aHash/dHash) + Hamming-banded near-dup -------------


def _ppm_bytes(img):
    import numpy as np

    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def _ahash_ref(img, grid=8):
    """Independent pure-Python replay of the integer aHash recipe."""
    h, w, c = img.shape
    gray = [[sum(int(img[r][cc][k]) for k in range(c)) // c for cc in range(w)]
            for r in range(h)]
    bh, bw = max(h // grid, 1), max(w // grid, 1)
    gh, gw = min(grid, h), min(grid, w)
    cells = [[0] * grid for _ in range(grid)]
    for r in range(gh):
        for cc in range(gw):
            s = sum(
                gray[r * bh + i][cc * bw + j]
                for i in range(bh)
                for j in range(bw)
            )
            cells[r][cc] = s // (bh * bw)
    flat = [cells[r][cc] for r in range(grid) for cc in range(grid)]
    total = sum(flat)
    bits = [1 if len(flat) * v >= total else 0 for v in flat]
    lo = sum(b << k for k, b in enumerate(bits[:32]))
    hi = sum(b << k for k, b in enumerate(bits[32:]))
    return hi, lo


def test_ahash_matches_independent_replay_and_flips_few_bits():
    import numpy as np

    from moisturizer_spark.operators.multimodal import ahash_from_array

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    assert ahash_from_array(img) == _ahash_ref(img)
    # 16x16 exercises the block-mean downsample
    big = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert ahash_from_array(big) == _ahash_ref(big)
    # near-identical image: nudge two pixels slightly -> hamming small
    near = img.copy()
    near[0, 0] = np.minimum(255, near[0, 0].astype(int) + 4).astype(np.uint8)
    near[3, 5] = np.maximum(0, near[3, 5].astype(int) - 4).astype(np.uint8)
    h1, l1 = ahash_from_array(img)
    h2, l2 = ahash_from_array(near)
    d = bin(h1 ^ h2).count("1") + bin(l1 ^ l2).count("1")
    assert d <= 3
    # unrelated image: hamming large
    other = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    h3, l3 = ahash_from_array(other)
    d2 = bin(h1 ^ h3).count("1") + bin(l1 ^ l3).count("1")
    assert d2 > 6


def test_dhash_brightness_invariance():
    import numpy as np

    from moisturizer_spark.operators.multimodal import dhash_from_array

    rng = np.random.RandomState(12)
    img = rng.randint(0, 200, size=(8, 8, 3), dtype=np.uint8)
    brighter = np.minimum(255, img.astype(int) + 40).astype(np.uint8)
    # a uniform brightness shift preserves every left<right comparison
    assert dhash_from_array(img) == dhash_from_array(brighter)


def test_image_phash_pipeline_and_banded_pairs(spark):
    """e2e through the REAL decode path: PPM bytes -> decode_ppm ->
    aHash in mapInPandas -> banded Hamming join. The planted
    near-identical pair must surface with its exact distance; the
    unrelated image must not pair with it."""
    import numpy as np

    from moisturizer_spark.operators.multimodal import (
        ahash_from_array,
        image_phash,
        phash_near_duplicates,
    )

    rng = np.random.RandomState(13)
    base = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    near = base.copy()
    near[1, 1] = 255 - near[1, 1]  # flip one pixel hard: 1-2 bits
    other = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    rows = [
        (1, _ppm_bytes(base)),
        (2, _ppm_bytes(near)),
        (3, _ppm_bytes(other)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    hashed = image_phash(df)
    got = {r["doc_id"]: (r["phash_hi"], r["phash_lo"]) for r in hashed.collect()}
    assert got[1] == tuple(ahash_from_array(base))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_duplicates(hashed).collect()
    }
    h1, l1 = got[1]
    h2, l2 = got[2]
    want = bin(h1 ^ h2).count("1") + bin(l1 ^ l2).count("1")
    assert want <= 6
    assert pairs.get((1, 2)) == want
    assert not any(3 in p for p in pairs)


def test_wav_energy_hash_near_vs_far():
    """Audio fingerprint kernel: a couple of flipped samples move 0-3
    bits; an unrelated clip lands ~half the occupied bits away; the
    empty clip is the all-ones degenerate (documented); and the kernel
    crops exactly like its oracle rendering (n not divisible by 64)."""
    import io
    import wave

    import numpy as np

    from moisturizer_spark.operators.multimodal import (
        decode_wav,
        wav_energy_hash,
    )

    def wav_bytes(samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(1)
            wf.setframerate(8000)
            wf.writeframes(bytes(samples))
        return buf.getvalue()

    rng = np.random.RandomState(5)
    a = list(rng.randint(0, 256, 645))  # 645 = 64*10 + 5: crop path
    b = list(a)
    b[10] = 255 - b[10]
    b[300] = 0
    c = list(rng.randint(0, 256, 645))
    ha = wav_energy_hash(decode_wav(wav_bytes(a)), grid=64)
    hb = wav_energy_hash(decode_wav(wav_bytes(b)), grid=64)
    hc = wav_energy_hash(decode_wav(wav_bytes(c)), grid=64)

    def d(x, y):
        return bin(x[0] ^ y[0]).count("1") + bin(x[1] ^ y[1]).count("1")

    assert d(ha, hb) <= 3
    assert d(ha, hc) > 10
    assert wav_energy_hash(decode_wav(wav_bytes([])), grid=64) == (
        (1 << 32) - 1,
        (1 << 32) - 1,
    )
    # independent integer replay incl. the crop (usable = 64*10 = 640)
    m, usable = 10, 640
    e = [sum(a[k * m : min((k + 1) * m, usable)]) for k in range(64)]
    total = sum(e)
    bits = [1 if 64 * v >= total else 0 for v in e]
    lo = sum(bit << k for k, bit in enumerate(bits[:32]))
    hi = sum(bit << k for k, bit in enumerate(bits[32:]))
    assert ha == (hi, lo)


def test_audio_pipeline_through_image_phash(spark):
    """The kernel plugs into image_phash's decoder/kernel slots: WAV
    binaries hash through the real decode path and the planted
    near-identical clip pairs via the shared Hamming banding."""
    import io
    import wave

    import numpy as np

    from moisturizer_spark.operators.multimodal import (
        decode_wav,
        image_phash,
        phash_near_duplicates,
        wav_energy_hash,
    )

    def wav_bytes(samples):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(1)
            wf.setframerate(8000)
            wf.writeframes(bytes(samples))
        return buf.getvalue()

    rng = np.random.RandomState(6)
    base = list(rng.randint(0, 256, 640))
    near = list(base)
    near[5] = 0
    other = list(rng.randint(0, 256, 640))
    df = spark.createDataFrame(
        [(1, wav_bytes(base)), (2, wav_bytes(near)), (3, wav_bytes(other))],
        "doc_id long, content binary",
    )
    hashed = image_phash(
        df, decoder=decode_wav, kernel=wav_energy_hash, grid=64
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_duplicates(hashed).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert not any(3 in p for p in pairs)


def test_resize_images_integer_box_filter(spark):
    """Resize is a deterministic integer box filter: 16x16 -> 8x8
    equals the 2x2 floor-means, the output payload is a valid PPM that
    round-trips through decode_ppm at the new size, and resize+ahash
    equals ahash of the already-8x8 mean image (the downsample IS
    aHash's pooling)."""
    import numpy as np

    from moisturizer_spark.operators.multimodal import (
        ahash_from_array,
        decode_ppm,
        resize_image_array,
        resize_images,
    )

    rng = np.random.RandomState(21)
    big = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    small = resize_image_array(big, 8, 8)
    want = big.astype(np.int64).reshape(8, 2, 8, 2, 3).sum(axis=(1, 3)) // 4
    assert (small == want).all()
    # upscale repeats pixels
    up = resize_image_array(small, 16, 16)
    assert (up[::2, ::2] == small).all() and (up[1::2, 1::2] == small).all()
    # through Spark: payload round-trips at the new size
    df = spark.createDataFrame([(1, _ppm_bytes(big))], "doc_id long, content binary")
    row = resize_images(df, 8, 8).first()
    dec = decode_ppm(bytes(row["resized"]))
    assert dec.shape == (8, 8, 3) and (dec == small).all()
    assert ahash_from_array(big) == ahash_from_array(small)


# -- video: fixed-frame splitter + per-frame phash + near-dup ---------------


def test_fixed_frame_splitter_contract():
    from moisturizer_spark.operators.multimodal import fixed_frame_splitter

    split = fixed_frame_splitter(4)
    assert split(b"aaaabbbbcc") == [b"aaaa", b"bbbb"]  # partial tail dropped
    assert split(b"") == []
    with pytest.raises(ValueError, match="positive"):
        fixed_frame_splitter(0)


def _video_bytes(frames):
    return b"".join(_ppm_bytes(f) for f in frames)


def test_video_near_duplicates_all_frames_must_match(spark):
    """Planted contract: B = A with one pixel nudged in one frame →
    near-dup; C = A with one frame REPLACED by noise → excluded (that
    frame's distance blows past the threshold even though the other
    frames band-match); D = A truncated to 2 frames → excluded by the
    frame-count equality even though every common frame is identical."""
    import numpy as np

    from moisturizer_spark.operators.multimodal import (
        video_near_duplicates,
        video_phash,
    )

    rng = np.random.RandomState(23)
    base = [rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
            for _ in range(3)]
    near = [f.copy() for f in base]
    near[1][0][0][0] = (int(near[1][0][0][0]) + 40) % 256  # one pixel
    far = [f.copy() for f in base]
    far[2] = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    rows = [
        (1, _video_bytes(base)),
        (2, _video_bytes(near)),
        (3, _video_bytes(far)),
        (4, _video_bytes(base[:2])),  # shorter cut of A
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    frame_bytes = len(_ppm_bytes(base[0]))
    hashes = video_phash(df, frame_bytes=frame_bytes)
    got = {(r.id_a, r.id_b): (r.n_frames, r.max_hamming)
           for r in video_near_duplicates(hashes, max_distance=6).collect()}
    assert (1, 2) in got
    nf, mh = got[(1, 2)]
    assert nf == 3 and mh <= 6
    assert all(3 not in pair and 4 not in pair for pair in got)


def test_video_phash_equals_per_frame_image_phash(spark):
    """video_phash is exactly sample_frames ∘ image_phash: per-frame
    hashes match hashing each frame as a standalone image."""
    import numpy as np

    from moisturizer_spark.operators.multimodal import (
        image_phash,
        video_phash,
    )

    rng = np.random.RandomState(7)
    frames = [rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
              for _ in range(4)]
    df = spark.createDataFrame(
        [(9, _video_bytes(frames))], "doc_id long, content binary"
    )
    via_video = {
        r.frame_idx: (r.phash_hi, r.phash_lo)
        for r in video_phash(
            df, frame_bytes=len(_ppm_bytes(frames[0]))
        ).collect()
    }
    singles = spark.createDataFrame(
        [(i, _ppm_bytes(f)) for i, f in enumerate(frames)],
        "doc_id long, content binary",
    )
    via_image = {
        r.doc_id: (r.phash_hi, r.phash_lo)
        for r in image_phash(singles).collect()
    }
    assert via_video == via_image


def test_phash_hot_band_cap(spark):
    """max_band_members (round-10 scale probe): a hot band bucket is
    skipped from candidate generation, while a pair sharing a NON-hot
    band still surfaces; cap=None keeps the exact uncapped semantics."""
    from moisturizer_spark.operators.multimodal import (
        phash_near_duplicates,
    )

    # ids 0..9: identical hashes -> every band bucket holds all 10
    # (45 pairs at hamming 0). ids 100, 101: share only band 3
    # (hi high half = 7) with each other, differ from the hot group,
    # and are 2 bits apart (bits inside bands 0 and 2 of each other).
    hot = [(i, 1 * 65536 + 2, 3 * 65536 + 4) for i in range(10)]
    pair = [
        (100, 7 * 65536 + 9, 5 * 65536 + 8),
        (101, 7 * 65536 + (9 ^ 1), 5 * 65536 + (8 ^ 1)),
    ]
    df = spark.createDataFrame(
        hot + pair, "doc_id long, phash_hi long, phash_lo long"
    )
    uncapped = {
        (r.id_a, r.id_b)
        for r in phash_near_duplicates(df).collect()
    }
    assert (100, 101) in uncapped and len(uncapped) == 45 + 1
    capped = {
        (r.id_a, r.id_b)
        for r in phash_near_duplicates(df, max_band_members=5).collect()
    }
    assert capped == {(100, 101)}


def test_video_hot_band_cap(spark):
    """The video variant's cap keys on (frame, band, value)."""
    from moisturizer_spark.operators.multimodal import (
        video_near_duplicates,
    )

    # 10 identical 1-frame videos (hot) + one distinct near-dup pair
    rows = [(i, 0, 1 * 65536 + 2, 3 * 65536 + 4) for i in range(10)]
    rows += [
        (100, 0, 7 * 65536 + 9, 5 * 65536 + 8),
        (101, 0, 7 * 65536 + (9 ^ 1), 5 * 65536 + (8 ^ 1)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, frame_idx int, phash_hi long, phash_lo long"
    )
    uncapped = {
        (r.id_a, r.id_b)
        for r in video_near_duplicates(df).collect()
    }
    assert (100, 101) in uncapped and len(uncapped) == 45 + 1
    capped = {
        (r.id_a, r.id_b)
        for r in video_near_duplicates(df, max_band_members=5).collect()
    }
    assert capped == {(100, 101)}
