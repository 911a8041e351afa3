"""Multimodal plumbing tests: binary payload schema, Arrow-batched
feature extraction, frame sampling, stubbed codec boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from memories_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthesize_media(spark, 30).cache()


def test_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_deterministic(media):
    f1 = {r.media_id: r.feature for r in mm.extract_features(media, dim=16).collect()}
    f2 = {r.media_id: r.feature for r in mm.extract_features(media, dim=16).collect()}
    assert f1 == f2
    assert len(f1) == 30
    assert all(len(v) == 16 for v in f1.values())
    assert all(-1.0 <= x <= 1.0 for v in f1.values() for x in v)
    # distinct payloads -> distinct features
    assert len({tuple(v) for v in f1.values()}) == 30


def test_real_codec_is_explicit_stub(media):
    with pytest.raises(Exception) as exc_info:
        mm.extract_features(media, dim=8, use_real_codec=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_sample_frames_only_video(media):
    frames = mm.sample_frames(media, every_ms=500, max_frames=4)
    rows = frames.collect()
    video_ids = {r.media_id for r in media.filter(F.col("kind") == "video").collect()}
    assert {r.media_id for r in rows} <= video_ids
    # every sampled video produces <= max_frames, correctly spaced
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, fr in by_media.items():
        assert len(fr) <= 4
        assert [f.frame_ms for f in sorted(fr, key=lambda x: x.frame_idx)] == [
            i * 500 for i in range(len(fr))
        ]
    # frame payloads are per-frame distinct
    assert len({bytes(r.frame_payload) for r in rows}) == len(rows)


def test_media_stats(media):
    stats = {(r.kind, r.format): r.n for r in mm.media_stats(media).collect()}
    assert stats == {("audio", "wav"): 10, ("image", "png"): 10, ("video", "mp4"): 10}


def test_features_join_back(media, spark):
    """Features join back to metadata on media_id (the downstream
    curation-join shape)."""
    feats = mm.extract_features(media, dim=8)
    joined = feats.join(media.select("media_id", "meta"), "media_id")
    assert joined.count() == 30


def test_window_audio_hops_and_overlaps(media):
    """Audio windowing: only audio rows explode; windows advance by
    the hop (overlapping when hop < window), stay within duration,
    and energies are deterministic across runs."""
    from memories_spark.operators.multimodal import window_audio

    wins = window_audio(media, window_ms=400, hop_ms=200).collect()
    assert wins, "audio rows must produce windows"
    kinds = {r.media_id % 3 for r in wins}
    assert kinds == {1}, kinds  # synthesize_media: kind=audio iff id%3==1
    by_media: dict[int, list] = {}
    for r in wins:
        by_media.setdefault(r.media_id, []).append(r)
    for rows in by_media.values():
        rows.sort(key=lambda r: r.win_idx)
        for i, r in enumerate(rows):
            assert r.win_idx == i
            assert r.start_ms == i * 200
            assert r.end_ms == r.start_ms + 400
            assert 0.0 <= r.energy <= 1.0
    # deterministic: re-running yields identical rows
    again = window_audio(media, window_ms=400, hop_ms=200).collect()
    key = lambda r: (r.media_id, r.win_idx)  # noqa: E731
    assert sorted(map(tuple, wins), key=lambda t: t[:2]) == sorted(
        map(tuple, again), key=lambda t: t[:2]
    )
