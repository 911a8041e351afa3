"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched decode / feature-extract / frame-sample plumbing.

Design (per the large-scale training-data pipeline requirements):
image/audio/video payloads are ``binary`` columns with a typed
metadata struct; all per-item compute runs as ``mapInPandas`` over
Arrow batches so bytes never round-trip through per-row Python
pickling. The actual codec step is STUBBED — the image/audio
libraries are not in this container — behind ``_decode_real``, which
raises ``NotImplementedError``; the deterministic fake featurizer
keeps every piece of Spark-side plumbing (schema, batch shape,
partitioning, output contract) real and testable.

Scale notes: payload tables should be written with
``spark.sql.files.maxPartitionBytes`` sized so one task holds a few
hundred MB of payloads; decode is embarrassingly parallel (no
shuffle); frame sampling explodes rows, so repartition by media_id
afterwards if a downstream join needs co-location.
"""

from __future__ import annotations

import hashlib
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


def synthesize_media(spark: SparkSession, n: int, seed: str = "media") -> DataFrame:
    """Deterministic fake media table for tests: payload bytes are
    md5-chained from (seed, id), metadata derived from the id."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"{seed}:{i}".encode()).digest() * 8  # 128 bytes
        meta = {
            "width": 64 + (i % 8) * 32 if kind == "image" else None,
            "height": 64 + (i % 5) * 32 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": (1000 + i * 137) if kind in ("audio", "video") else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_real(payload: bytes, kind: str, fmt: str) -> list[float]:
    """The true codec boundary. Container has no image/audio libs, so
    this is an explicit stub — swap in PIL/torchaudio/pyav here."""
    raise NotImplementedError(
        "real media decoding requires codec libraries not present in this environment"
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic featurizer: md5-chain over the payload → floats
    in [-1, 1]. Stands in for the decoded-content embedding so the
    whole pipeline (schema, batching, joins) runs for real."""
    out: list[float] = []
    block = payload
    while len(out) < dim:
        block = hashlib.md5(block).digest()
        out.extend((b - 127.5) / 127.5 for b in block)
    return out[:dim]


def extract_features(media: DataFrame, dim: int = 32, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each task receives pandas batches of
    (media_id, kind, payload, meta); output is one feature vector per
    item. With ``use_real_codec`` the stub raises — the flag
    documents where production decoding plugs in.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                if use_real_codec:
                    feats.append(_decode_real(raw, kind, ""))
                else:
                    feats.append(_fake_feature(raw, dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 500, max_frames: int = 16) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    timestamp. Frame payloads are deterministic stubs (md5 of
    payload+index) standing in for the decoded frame bytes; the
    row-explosion shape, schema and partitioning are the real thing.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, payloads = [], [], [], []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                duration = int(meta["duration_ms"] or 0)
                n = min(max_frames, max(duration // every_ms, 0))
                raw = bytes(payload)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    mss.append(i * every_ms)
                    payloads.append(hashlib.md5(raw + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ms": pd.Series(mss, dtype="int64"),
                    "frame_payload": payloads,
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


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
    hop-advanced window of each audio item, with a per-window energy
    scalar. Windows overlap when ``hop_ms < window_ms`` — the same
    hopping semantics as the event-table sliding windows, applied to
    media time. Energy comes from the deterministic fake featurizer
    (md5 over payload+index); ``_decode_real`` is where a real
    waveform decode plugs in. Row explosion is bounded by
    ``max_windows`` per item; repartition by media_id downstream if a
    join needs co-location.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, ends, energies = [], [], [], [], []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "audio":
                    continue
                duration = int(meta["duration_ms"] or 0)
                n = 0
                start = 0
                raw = bytes(payload)
                while start + window_ms <= duration and n < max_windows:
                    h = hashlib.md5(raw + n.to_bytes(4, "big") + b"e").digest()
                    ids.append(mid)
                    idxs.append(n)
                    starts.append(start)
                    ends.append(start + window_ms)
                    energies.append(h[0] / 255.0)
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
        T.StructField("fp", T.StringType()),  # 32-hex perceptual-hash stub
    ]
)


def frame_fingerprints(
    media: DataFrame, every_ms: int = 500, max_frames: int = 16
) -> DataFrame:
    """Per-frame perceptual-hash stub for video rows: one row per
    sampled frame with a 128-bit hex fingerprint.

    Stands in for decode->downscale->DCT->phash; the real codec is
    the stubbed boundary (see module docstring), so the fingerprint
    is md5 over the payload hex + frame index — deterministic,
    cross-engine reproducible, and computed inside the same
    Arrow-batched ``mapInPandas`` stage a real phash would run in
    (CPU-heavy per-frame work, embarrassingly parallel, no shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fps = [], [], []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                duration = int(meta["duration_ms"] or 0)
                n = min(max_frames, max(duration // every_ms, 0))
                ptxt = bytes(payload).hex()
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    fps.append(
                        hashlib.md5(f"{ptxt}-{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "fp": pd.Series(fps, dtype="object"),
                }
            )

    return media.mapInPandas(run, FINGERPRINT_SCHEMA)
