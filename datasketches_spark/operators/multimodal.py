"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` payloads + typed metadata, processed in
Arrow-batched ``mapInPandas`` stages.

The Spark-side mechanics — schema, partitioning, UDF signatures, batch
shapes — are real and tested. Codecs: this container ships no image/audio
libraries, so two trivial formats are decoded with pure NumPy — binary
PPM/PGM (P6/P5) images and PCM-16 WAV audio — which makes ``fake=False`` a
fully working branch end-to-end (decode → resize → feature-extract).
Payloads in any other format fall back to a deterministic fake decoder
when ``fake=True`` or raise ``NotImplementedError`` (clearly marked stub
for real-world codecs like JPEG/MP3, which need external libraries).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("mime", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("payload_sha256", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
])


# ------------------------------------------------------------ PPM / PGM

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6)."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → (H, W, C) uint8. Pure NumPy, handles
    whitespace/comments per the netpbm spec."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if payload[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    n = w * h * channels
    img = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return img.reshape(h, w, channels)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (the pure-NumPy stand-in for a real resampler)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows][:, cols]


# ----------------------------------------------------- multi-frame video
# "video" for this engine's test path = concatenated binary PPM frames (a
# motion-PPM stream, like netpbm's .ppm streams): real container parsing +
# frame sampling without external codecs.

def encode_ppm_video(frames: list[np.ndarray]) -> bytes:
    """List of (H, W, 3) uint8 frames → concatenated-PPM stream."""
    return b"".join(encode_ppm(f) for f in frames)


def iter_ppm_frames(payload: bytes):
    """Yield (offset-decoded) frames from a concatenated-PPM stream."""
    pos = 0
    while pos < len(payload):
        if payload[pos : pos + 2] not in (b"P6", b"P5"):
            raise ValueError(f"bad frame magic at byte {pos}")
        frame = decode_ppm(payload[pos:])
        h, w, c = frame.shape
        # recompute this frame's byte length: header ends after maxval ws
        hdr_end = _ppm_header_end(payload, pos)
        pos = hdr_end + h * w * c
        yield frame


def _ppm_header_end(payload: bytes, start: int) -> int:
    pos, fields = start + 2, 0
    while fields < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        while not payload[pos : pos + 1].isspace():
            pos += 1
        fields += 1
    return pos + 1


def sample_frames(payload: bytes, every: int = 2, max_frames: int = 16) -> list[np.ndarray]:
    """Frame sampling: every ``every``-th frame, capped at ``max_frames`` —
    the decode/frame-sample step of a video ingestion pipeline."""
    out = []
    for i, frame in enumerate(iter_ppm_frames(payload)):
        if i % every == 0:
            out.append(frame)
            if len(out) >= max_frames:
                break
    return out


def video_features(payload: bytes, dim: int = 64, every: int = 2) -> np.ndarray:
    """Mean of sampled-frame image features — deterministic video-level
    embedding from the real decode path."""
    frames = sample_frames(payload, every=every)
    if not frames:
        return np.zeros(dim, dtype=np.float32)
    return np.mean([image_features(f, dim) for f in frames], axis=0).astype(np.float32)


# -------------------------------------------------------------- WAV PCM16

def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 → RIFF/WAVE PCM-16 payload."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM-16 → ((n, ch) int16 samples, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM-16 supported: fmt={audio_fmt} bits={bits}")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, n_ch), rate


# ------------------------------------------------------------- features

def image_features(img: np.ndarray, dim: int = 64) -> np.ndarray:
    """Deterministic image features: per-channel mean/std + a downsampled
    grayscale grid filling the remaining dims, all in [0, 1]."""
    imgf = img.astype(np.float32) / 255.0
    stats = np.concatenate([imgf.mean(axis=(0, 1)), imgf.std(axis=(0, 1))])
    grid_n = max(dim - stats.size, 0)
    side = max(int(np.ceil(np.sqrt(grid_n))), 1)
    gray = imgf.mean(axis=2) if imgf.ndim == 3 else imgf
    grid = resize_nearest(gray, side, side).ravel()[:grid_n]
    return np.concatenate([stats, grid])[:dim].astype(np.float32)


def audio_features(samples: np.ndarray, rate: int, dim: int = 64) -> np.ndarray:
    """Deterministic audio features: RMS, zero-crossing rate, then
    per-block energies over ``dim - 2`` equal time blocks."""
    mono = samples.astype(np.float32).mean(axis=1) / 32768.0
    rms = float(np.sqrt(np.mean(mono**2))) if mono.size else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if mono.size > 1 else 0.0
    n_blocks = max(dim - 2, 1)
    blocks = np.array_split(mono, n_blocks) if mono.size else [np.zeros(1)] * n_blocks
    energies = np.array([float(np.sqrt(np.mean(b**2))) if b.size else 0.0 for b in blocks])
    return np.concatenate([[rms, zcr], energies])[:dim].astype(np.float32)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for unsupported codecs: features derived from
    the sha256 of the payload. Stable across machines/retries."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.Generator(np.random.Philox(key=seed, counter=[0, 0, 0, 0]))
    return rng.standard_normal(dim).astype(np.float32)


def decode_features(payload: bytes, fake: bool = False, dim: int = 64) -> np.ndarray:
    """Sniff the payload format and extract features: PPM/PGM and WAV PCM16
    decode for real (pure NumPy); anything else uses the deterministic fake
    decoder when ``fake=True`` or raises (honest stub — real-world codecs
    need libraries this container does not ship)."""
    if payload[:2] in (b"P6", b"P5"):
        first = decode_ppm(payload)
        h, w, c = first.shape
        if _ppm_header_end(payload, 0) + h * w * c < len(payload):
            return video_features(payload, dim)  # multi-frame PPM stream
        return image_features(first, dim)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return audio_features(*decode_wav(payload), dim=dim)
    if fake:
        return _fake_decode(payload, dim)
    raise NotImplementedError(
        "unsupported media format: only PPM/PGM and WAV PCM16 decode without "
        "external libraries; pass fake=True for deterministic stand-in features"
    )


def decode_image(payload: bytes, fake: bool = False, dim: int = 64) -> np.ndarray:
    """Back-compat alias for feature extraction from one payload."""
    return decode_features(payload, fake=fake, dim=dim)


def extract_features(media: DataFrame, dim: int = 64, fake: bool = True,
                     target_partitions: int | None = None) -> DataFrame:
    """media table → per-item feature vectors.

    Repartitions by media_id before the Arrow stage so batch memory is
    bounded and independent of upstream partitioning (large binary payloads
    make input-split sizing unreliable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas = [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                shas.append(hashlib.sha256(b).hexdigest())
                feats.append(decode_features(b, fake=fake, dim=dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "payload_sha256": shas,
                "feature": feats,
            })

    pruned = media.select("media_id", "kind", "payload")
    if target_partitions:
        pruned = pruned.repartition(target_partitions, "media_id")
    return pruned.mapInPandas(run, FEATURE_SCHEMA)


def media_near_dup_pairs(media: DataFrame, dim: int = 64, threshold: float = 0.995,
                         fake: bool = True, n_tables: int = 16, n_planes: int = 8,
                         seed: int | None = None) -> DataFrame:
    """NEAR-duplicate detection for media columns (round-5 task): decode →
    deterministic feature vector (real PPM/PGM/WAV decode, ``fake`` governs
    the unsupported-codec fallback) → multi-table hyperplane-LSH cosine
    pairs. Wires ``extract_features`` into ``ann.cosine_near_dup_pairs``:
    candidates come from an equi-join on (table, bucket), each verified by
    the exact cosine — no cross join at any corpus size.

    Note on thresholds: the features are non-negative (stats + pixel grid),
    so even unrelated images sit at cosine ~0.9; planted perturbed copies
    sit at ~0.9999. The default threshold 0.995 separates the two regimes
    (public average-hash-style perturbation detection)."""
    from datasketches_spark.config import DEFAULT_SEED
    from datasketches_spark.operators.ann import cosine_near_dup_pairs

    feats = extract_features(media, dim=dim, fake=fake)
    emb = feats.select(F.col("media_id").alias("vec_id"),
                       F.col("feature").alias("embedding"))
    return cosine_near_dup_pairs(
        emb, dim=dim, threshold=threshold, n_tables=n_tables,
        n_planes=n_planes, seed=DEFAULT_SEED if seed is None else seed)


def synthetic_media(spark, n: int, seed: int = 42, kind: str = "image") -> DataFrame:
    """Deterministic media table for tests: REAL encoded payloads — PPM
    images (kind='image') or WAV PCM16 clips (kind='audio') — so the
    fake=False decode branch is exercised end-to-end."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                rng = np.random.Generator(np.random.Philox(key=seed, counter=[mid, 1, 0, 0]))
                if kind == "audio":
                    samples = (rng.standard_normal(int(800 + rng.integers(0, 800))) * 8000)
                    payload = encode_wav_pcm16(samples.astype(np.int16), rate=16000)
                    mime, meta = "audio/wav", {"rate": "16000"}
                elif kind == "video":
                    n_frames = 4 + int(rng.integers(0, 5))
                    frames = [rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
                              for _ in range(n_frames)]
                    payload = encode_ppm_video(frames)
                    mime, meta = "video/x-motion-ppm", {"frames": str(n_frames)}
                else:
                    h, w = 8 + int(rng.integers(0, 8)), 8 + int(rng.integers(0, 8))
                    payload = encode_ppm(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
                    mime, meta = "image/x-portable-pixmap", {"w": str(w), "h": str(h)}
                rows.append((mid, kind, mime, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "mime", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def synthetic_media_with_near_dups(spark, n: int, seed: int = 42,
                                   roles: int = 5, dup_role: int = 4) -> DataFrame:
    """Deterministic image table with PLANTED near-duplicates: every id with
    ``id % roles == dup_role`` carries a slightly-perturbed copy of id-1's
    image (a handful of pixels nudged by ±1 grey level — the classic
    average-hash/DCT-perceptual-dup scenario); all other ids are
    independent random images. Ground truth: pairs (id-1, id) for those
    ids."""
    assert 1 <= dup_role < roles

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                is_dup = mid % roles == dup_role
                base = mid - 1 if is_dup else mid
                rng = np.random.Generator(np.random.Philox(key=seed, counter=[base, 1, 0, 0]))
                h, w = 8 + int(rng.integers(0, 8)), 8 + int(rng.integers(0, 8))
                px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                if is_dup:
                    prng = np.random.Generator(
                        np.random.Philox(key=seed, counter=[mid, 2, 0, 0]))
                    flat = px.astype(np.int16).ravel()
                    idx = prng.integers(0, flat.size, size=4)
                    flat[idx] = np.clip(
                        flat[idx] + prng.choice([-1, 1], size=4), 0, 255)
                    px = flat.astype(np.uint8).reshape(h, w, 3)
                rows.append((mid, "image", "image/x-portable-pixmap",
                             encode_ppm(px), {"base": str(base)}))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "mime", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)
