"""Multimodal columns: opaque binary payloads + typed metadata, with
REAL pure-stdlib codecs feeding Arrow-batched decode / feature-extract
/ frame-sample stages.

Design (per the large-scale training-data pipeline requirements):
image/audio/video payloads are ``binary`` columns with a typed
metadata struct; all per-item compute runs as ``mapInPandas`` over
Arrow batches so bytes never round-trip through per-row Python
pickling. The codec boundary is REAL and containerized to what the
stdlib can decode (the round-2 review's remaining stub, deleted):

- audio — RIFF/WAV, mono int16, via ``wave`` + ``struct``;
- image — binary PPM (P6), parsed by hand;
- video — a toy ``RVID`` frame container (magic + frame interval +
  length-prefixed PPM frames), standing in for a real container the
  way fixtures stand in for production data. Swapping PIL/pyav in
  means replacing ONLY :func:`decode_image` / :func:`decode_video`;
  every downstream stage already consumes decoded pixels/samples.

Features are honest signal statistics computed from DECODED content
(piecewise-average downsampling, RMS energy, average-hash
fingerprints) — if a codec mis-parses, every downstream value moves.

Scale notes: payload tables should be written with
``spark.sql.files.maxPartitionBytes`` sized so one task holds a few
hundred MB of payloads; decode is embarrassingly parallel (no
shuffle); frame sampling explodes rows, so repartition by media_id
afterwards if a downstream join needs co-location.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)

RVID_MAGIC = b"RVID"


# ---------------------------------------------------------------------
# Codecs (pure stdlib)
# ---------------------------------------------------------------------


def encode_wav(samples: list[int], sample_rate: int) -> bytes:
    """Mono int16 RIFF/WAV via the stdlib ``wave`` module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_audio(payload: bytes) -> tuple[int, list[int]]:
    """WAV -> (sample_rate, int16 samples)."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError("expected mono int16 WAV")
        n = w.getnframes()
        raw = w.readframes(n)
        return w.getframerate(), list(struct.unpack(f"<{n}h", raw))


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6), 8-bit RGB."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length must be width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(rgb)


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """PPM (P6) -> (width, height, rgb bytes)."""
    data = bytes(payload)
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace separated
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(data[i:j])
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError("expected 8-bit PPM")
    rgb = data[i : i + width * height * 3]
    if len(rgb) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, rgb


def encode_rvid(frames: list[bytes], frame_interval_ms: int) -> bytes:
    """Toy video container: magic + u32 interval + u32 count + each
    frame as u32 length + PPM bytes."""
    out = [RVID_MAGIC, struct.pack("<II", frame_interval_ms, len(frames))]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def decode_video(payload: bytes) -> tuple[int, list[bytes]]:
    """RVID -> (frame_interval_ms, [PPM frame bytes])."""
    data = bytes(payload)
    if data[:4] != RVID_MAGIC:
        raise ValueError("not an RVID payload")
    interval, count = struct.unpack_from("<II", data, 4)
    frames, off = [], 12
    for _ in range(count):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        frames.append(data[off : off + ln])
        off += ln
    return interval, frames


def _gray(rgb: bytes) -> list[int]:
    """Integer luma per pixel: (r + g + b) // 3 — exact, replayable."""
    return [
        (rgb[i] + rgb[i + 1] + rgb[i + 2]) // 3 for i in range(0, len(rgb), 3)
    ]


def _downsample(seq: list[float], dim: int) -> list[float]:
    """Piecewise-average downsample of a signal to ``dim`` buckets."""
    if not seq:
        return [0.0] * dim
    n = len(seq)
    out = []
    for k in range(dim):
        lo = k * n // dim
        hi = max((k + 1) * n // dim, lo + 1)
        window = seq[lo:hi] if lo < n else seq[-1:]
        out.append(sum(window) / len(window))
    return out


def decode_signal(payload: bytes, kind: str) -> list[float]:
    """Decode any media kind to a normalized scalar signal in [-1, 1]:
    gray pixels for images, samples for audio, per-frame gray means
    for video. The single codec dispatch every featurizer shares."""
    raw = bytes(payload)
    if kind == "image":
        _, _, rgb = decode_image(raw)
        return [g / 127.5 - 1.0 for g in _gray(rgb)]
    if kind == "audio":
        _, samples = decode_audio(raw)
        return [s / 32767.0 for s in samples]
    if kind == "video":
        _, frames = decode_video(raw)
        out = []
        for fr in frames:
            _, _, rgb = decode_image(fr)
            g = _gray(rgb)
            out.append((sum(g) / len(g)) / 127.5 - 1.0 if g else 0.0)
        return out
    raise ValueError(f"unknown media kind: {kind}")


# ---------------------------------------------------------------------
# Deterministic fixture generator (REAL payloads)
# ---------------------------------------------------------------------


def synthesize_media(spark: SparkSession, n: int, seed: str = "media") -> DataFrame:
    """Deterministic media table for tests with DECODABLE payloads:
    PPM images, WAV audio, RVID videos — content derived from the id
    by simple integer formulas (so any engine can re-derive it)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 4 + (i % 4) * 2, 4 + (i % 3) * 2
            rgb = bytes((i * 13 + p * 7) % 256 for p in range(w * h * 3))
            payload = encode_ppm(w, h, rgb)
            meta = {"width": w, "height": h, "sample_rate": None,
                    "duration_ms": None, "format": "ppm"}
        elif kind == "audio":
            sr, duration = 1000, 1000 + i * 137
            samples = [((i * 37 + j * 11) % 201) - 100 for j in range(duration)]
            payload = encode_wav(samples, sr)
            meta = {"width": None, "height": None, "sample_rate": sr,
                    "duration_ms": duration, "format": "wav"}
        else:
            duration = 1000 + i * 137
            n_frames = min(16, duration // 500)
            frames = [
                encode_ppm(
                    4, 4,
                    bytes(
                        (i % 256, f, (i * 13 + f * 97) % 256)[p] if p < 3
                        else (i * 101 + f * 97 + p * 7) % 256
                        for p in range(48)
                    ),
                )
                for f in range(n_frames)
            ]
            payload = encode_rvid(frames, 500)
            meta = {"width": 4, "height": 4, "sample_rate": None,
                    "duration_ms": duration, "format": "rvid"}
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------
# Arrow-batched stages
# ---------------------------------------------------------------------


def extract_features(media: DataFrame, dim: int = 32) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: decode
    (real codecs) -> normalized scalar signal -> piecewise-average
    downsample to ``dim`` floats in [-1, 1]. ``mapInPandas``: each
    task receives pandas batches, no per-row pickling, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _downsample(decode_signal(payload, kind), dim)
                for payload, kind in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 500, max_frames: int = 16) -> DataFrame:
    """Frame sampling for video rows: decode the RVID container and
    emit one row per sampled frame (stride = every_ms over the stored
    frame interval), payload = the DECODED frame's PPM bytes. The
    row-explosion shape, schema and partitioning are the production
    contract; the codec is the real boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, payloads = [], [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                interval, frames = decode_video(bytes(payload))
                stride = max(every_ms // max(interval, 1), 1)
                picked = frames[::stride][:max_frames]
                for i, fr in enumerate(picked):
                    ids.append(mid)
                    idxs.append(i)
                    mss.append(i * stride * interval)
                    payloads.append(fr)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ms": pd.Series(mss, dtype="int64"),
                    "frame_payload": payloads,
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


SIGNAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("signal_sum", T.LongType()),
        T.StructField("signal_n", T.LongType()),
    ]
)


def signal_stats(media: DataFrame) -> DataFrame:
    """ALL-INTEGER decoded-content statistics per item: the sum and
    count of decoded units (integer luma per image/video-frame pixel,
    int16 samples for audio). Exactly replayable by any engine that
    re-derives the content, so a SQL oracle can value-check the whole
    codec path — a mis-parsed byte moves the sum."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums, ns = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                if kind == "image":
                    _, _, rgb = decode_image(raw)
                    g = _gray(rgb)
                    sums.append(sum(g))
                    ns.append(len(g))
                elif kind == "audio":
                    _, samples = decode_audio(raw)
                    sums.append(sum(samples))
                    ns.append(len(samples))
                else:
                    _, frames = decode_video(raw)
                    s = n = 0
                    for fr in frames:
                        _, _, rgb = decode_image(fr)
                        g = _gray(rgb)
                        s += sum(g)
                        n += len(g)
                    sums.append(s)
                    ns.append(n)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "signal_sum": pd.Series(sums, dtype="int64"),
                    "signal_n": pd.Series(ns, dtype="int64"),
                }
            )

    return media.mapInPandas(run, SIGNAL_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata rollup: per kind/format, counts and payload
    bytes — the catalog view a curation pipeline starts from."""
    return (
        media.groupBy("kind", F.col("meta.format").alias("format"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.avg("meta.duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind", "format")
    )


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("win_idx", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("energy", T.FloatType()),
    ]
)


def window_audio(
    media: DataFrame, window_ms: int = 1000, hop_ms: int = 500, max_windows: int = 64
) -> DataFrame:
    """Overlapping audio windowing (the STFT-prep shape): one row per
    hop-advanced window of each audio item, energy = RMS of the
    DECODED samples inside the window (normalized to [0, 1] by int16
    full scale). Windows overlap when ``hop_ms < window_ms`` — the
    same hopping semantics as the event-table sliding windows,
    applied to media time. Row explosion is bounded by
    ``max_windows`` per item; repartition by media_id downstream if a
    join needs co-location."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, ends, energies = [], [], [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio":
                    continue
                sr, samples = decode_audio(bytes(payload))
                duration = len(samples) * 1000 // sr
                n = 0
                start = 0
                while start + window_ms <= duration and n < max_windows:
                    lo = start * sr // 1000
                    hi = (start + window_ms) * sr // 1000
                    win = samples[lo:hi]
                    rms = (sum(s * s for s in win) / len(win)) ** 0.5 if win else 0.0
                    ids.append(mid)
                    idxs.append(n)
                    starts.append(start)
                    ends.append(start + window_ms)
                    energies.append(rms / 32767.0)
                    start += hop_ms
                    n += 1
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int64"),
                    "start_ms": pd.Series(starts, dtype="int64"),
                    "end_ms": pd.Series(ends, dtype="int64"),
                    "energy": pd.Series(energies, dtype="float32"),
                }
            )

    return media.mapInPandas(run, AUDIO_WINDOW_SCHEMA)


FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("fp", T.StringType()),  # hex average-hash
    ]
)


def ahash_bits(rgb: bytes) -> int:
    """Average hash over decoded pixels: integer luma per pixel, bit
    set where luma * n_pixels > total luma (i.e. above the mean) —
    all-integer, so any engine replays it exactly. Bit q of pixel q
    counts down from the MSB."""
    g = _gray(rgb)
    n = len(g)
    total = sum(g)
    bits = 0
    for q, v in enumerate(g):
        if v * n > total:
            bits |= 1 << (n - 1 - q)
    return bits


def frame_fingerprints(
    media: DataFrame, every_ms: int = 500, max_frames: int = 16
) -> DataFrame:
    """Per-frame perceptual hash for video rows: decode -> luma ->
    average-hash (the classic aHash: downscale is the stored frame
    resolution, bit = pixel above mean). One row per sampled frame
    with the hash as zero-padded hex. Runs inside the same
    Arrow-batched ``mapInPandas`` stage a DCT pHash would (CPU-heavy
    per-frame work, embarrassingly parallel, no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fps = [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                interval, frames = decode_video(bytes(payload))
                stride = max(every_ms // max(interval, 1), 1)
                picked = frames[::stride][:max_frames]
                for i, fr in enumerate(picked):
                    w, h, rgb = decode_image(fr)
                    hex_len = max((w * h + 3) // 4, 1)
                    ids.append(mid)
                    idxs.append(i)
                    fps.append(format(ahash_bits(rgb), f"0{hex_len}x"))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "fp": pd.Series(fps, dtype="object"),
                }
            )

    return media.mapInPandas(run, FINGERPRINT_SCHEMA)
