"""Structured Streaming tests: file-source event stream → watermarked
window agg → memory sink; foreachBatch incremental term stats."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from memories_spark.streaming import (
    dedup_event_stream,
    incremental_term_stats_sink,
    read_event_stream,
    windowed_event_counts,
)
from memories_spark.streaming.events import read_doc_stream


def _write_events(path: str, name: str, events: list[dict]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_windowed_event_counts_stream(spark, tmp_path):
    src = str(tmp_path / "events_in")
    _write_events(
        src,
        "batch1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:10:00Z", "user_id": 1, "event_type": "click", "value": 1.5},
            {"event_id": 2, "ts": "2024-01-01T00:40:00Z", "user_id": 2, "event_type": "click", "value": 2.0},
            {"event_id": 3, "ts": "2024-01-01T01:10:00Z", "user_id": 1, "event_type": "view", "value": 0.5},
            {"event_id": 4, "ts": "2024-01-01T01:20:00Z", "user_id": 3, "event_type": "click", "value": 4.25},
        ],
    )
    stream = read_event_stream(spark, src)
    assert stream.isStreaming
    counts = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        counts.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.window_start), r.event_type): (r.n, r.value_cents)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == (2, 350)
    assert got[("2024-01-01 01:00:00", "click")] == (1, 425)
    assert got[("2024-01-01 01:00:00", "view")] == (1, 50)


def test_dedup_event_stream_drops_redeliveries(spark, tmp_path):
    src = str(tmp_path / "dup_events_in")
    # event 1 delivered three times (twice in one file, once in a later
    # micro-batch file); event 2 once — dedup state must span batches
    _write_events(
        src,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:10:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 1, "ts": "2024-01-01T00:10:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T00:12:00Z", "user_id": 2, "event_type": "view", "value": 2.0},
        ],
    )
    _write_events(
        src,
        "b2.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:11:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 3, "ts": "2024-01-01T00:30:00Z", "user_id": 3, "event_type": "click", "value": 3.0},
        ],
    )
    deduped = dedup_event_stream(read_event_stream(spark, src), watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3]


def test_incremental_term_stats(spark, tmp_path):
    src = str(tmp_path / "docs_in")
    stats = str(tmp_path / "term_stats")
    ckpt = str(tmp_path / "ckpt")
    _write_events(
        src,
        "d1.json",
        [
            {"doc_id": 1, "text": "spark join filter"},
            {"doc_id": 2, "text": "join join window"},
        ],
    )
    q = incremental_term_stats_sink(read_doc_stream(spark, src), stats, ckpt)
    q.awaitTermination(120)

    # second micro-batch: only the delta is tokenized and appended
    _write_events(src, "d2.json", [{"doc_id": 3, "text": "spark window"}])
    q2 = incremental_term_stats_sink(read_doc_stream(spark, src), stats, ckpt)
    q2.awaitTermination(120)

    terms = spark.read.parquet(stats)
    compact = {
        (r.id, r.term): r.tf
        for r in terms.groupBy("id", "term").agg(F.sum("tf").alias("tf")).collect()
    }
    assert compact[(2, "join")] == 2
    assert compact[(1, "spark")] == 1
    assert compact[(3, "window")] == 1
    assert len(compact) == 7

    # periodic compaction: same logical stats, physically one rowset
    from memories_spark.streaming import compact_term_stats

    n = compact_term_stats(spark, stats)
    assert n == 7
    after = {
        (r.id, r.term): r.tf for r in spark.read.parquet(stats).collect()
    }
    assert after == compact
    # compacted table has exactly one row per (id, term): raw read
    # equals the groupBy view, so read amplification is gone
    assert spark.read.parquet(stats).count() == 7


def test_stream_is_incremental_not_rebuild(spark, tmp_path):
    """The checkpoint must prevent re-processing batch 1 files."""
    src = str(tmp_path / "docs_in2")
    stats = str(tmp_path / "stats2")
    ckpt = str(tmp_path / "ckpt2")
    _write_events(src, "d1.json", [{"doc_id": 1, "text": "alpha alpha"}])
    q = incremental_term_stats_sink(read_doc_stream(spark, src), stats, ckpt)
    q.awaitTermination(120)
    q2 = incremental_term_stats_sink(read_doc_stream(spark, src), stats, ckpt)
    q2.awaitTermination(120)
    terms = spark.read.parquet(stats)
    # tf for (1, alpha) must be 2 exactly once — no duplicate append
    assert [(r.id, r.term, r.tf) for r in terms.collect()] == [(1, "alpha", 2)]


def test_watermark_drops_late_events(spark, tmp_path):
    """An event older than the watermark horizon must NOT update its
    (already-finalized) window — the bounded-state guarantee the
    module docs claim."""
    src = str(tmp_path / "late_in")
    ckpt = str(tmp_path / "late_ckpt")
    out = str(tmp_path / "late_out")

    def run():
        stream = (
            spark.readStream.schema(read_event_stream(spark, src).schema).json(src)
        )
        counts = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
        q = (
            counts.writeStream.format("parquet")
            .outputMode("append")  # append emits a window once finalized
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # run 1: events at 00:10 and 01:50 -> watermark 01:20 checkpointed;
    # the [00:00, 01:00) window finalizes and is emitted with n=1
    _write_events(
        src,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:10:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T01:50:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
        ],
    )
    run()

    # run 2: an event 65 min behind the watermark (00:00 window already
    # finalized -> must be dropped) plus a fresh 02:30 event that
    # finalizes [01:00, 02:00)
    _write_events(
        src,
        "b2.json",
        [
            {"event_id": 3, "ts": "2024-01-01T00:15:00Z", "user_id": 2, "event_type": "click", "value": 1.0},
            {"event_id": 4, "ts": "2024-01-01T02:30:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
        ],
    )
    run()

    rows = [
        ((str(r.window_start), r.event_type), r.n)
        for r in spark.read.parquet(out).collect()
    ]
    # each finalized window emitted exactly once; the late event never
    # re-opened or re-emitted the 00:00 window
    assert sorted(rows) == [
        (("2024-01-01 00:00:00", "click"), 1),
        (("2024-01-01 01:00:00", "click"), 1),
    ]


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState gap sessionization: sessions close when a
    later event exceeds the gap (within a batch and across batches);
    the open tail session stays in state."""
    from memories_spark.streaming import read_event_stream, sessionize_stream

    src = str(tmp_path / "sess_in")
    # batch file 1: user 1 has a 2-event session then a gap > 30 min
    _write_events(
        src,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T00:10:00Z", "user_id": 1, "event_type": "view", "value": 1.0},
            {"event_id": 3, "ts": "2024-01-01T02:00:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
        ],
    )
    # batch file 2: closes user 1's 02:00 session; user 2 stays open
    _write_events(
        src,
        "b2.json",
        [
            {"event_id": 4, "ts": "2024-01-01T05:00:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 5, "ts": "2024-01-01T05:05:00Z", "user_id": 2, "event_type": "view", "value": 1.0},
        ],
    )
    stream = (
        spark.readStream.schema(read_event_stream(spark, src).schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    sessions = sessionize_stream(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    assert got[(1, "2024-01-01 00:00:00")] == ("2024-01-01 00:10:00", 2)
    assert got[(1, "2024-01-01 02:00:00")] == ("2024-01-01 02:00:00", 1)
    # open sessions (user 1 @ 05:00, user 2 @ 05:05) have not flushed
    assert len(got) == 2


def test_sliding_event_counts_stream(spark, tmp_path):
    """Hopping windows: each event lands in exactly two 10m/5m windows."""
    from memories_spark.streaming import sliding_event_counts_stream

    src = str(tmp_path / "slide_in")
    _write_events(
        src,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:07:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T00:12:00Z", "user_id": 2, "event_type": "click", "value": 2.0},
        ],
    )
    counts = sliding_event_counts_stream(read_event_stream(spark, src))
    q = (
        counts.writeStream.format("memory")
        .queryName("slide_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r.window_start): (r.n, r.value_cents)
        for r in spark.sql("SELECT * FROM slide_out").collect()
    }
    # event1 (00:07) -> windows starting 00:00 and 00:05;
    # event2 (00:12) -> windows starting 00:05 and 00:10
    assert got["2024-01-01 00:00:00"] == (1, 100)
    assert got["2024-01-01 00:05:00"] == (2, 300)
    assert got["2024-01-01 00:10:00"] == (1, 200)
    assert len(got) == 3


def test_attribute_clicks_to_views_stream(spark, tmp_path):
    """Stream-stream time-bounded join: clicks attach to the same
    user's view within 10 minutes; out-of-window or cross-user clicks
    do not match."""
    from memories_spark.streaming import attribute_clicks_to_views

    src = str(tmp_path / "attr_in")
    _write_events(
        src,
        "b1.json",
        [
            # user 1: view then click 3 min later -> match (lag 180)
            {"event_id": 10, "ts": "2024-01-01T00:00:00Z", "user_id": 1, "event_type": "view", "value": 0.0},
            {"event_id": 11, "ts": "2024-01-01T00:03:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
            # user 2: click 20 min after the view -> outside the window
            {"event_id": 20, "ts": "2024-01-01T00:00:00Z", "user_id": 2, "event_type": "view", "value": 0.0},
            {"event_id": 21, "ts": "2024-01-01T00:20:00Z", "user_id": 2, "event_type": "click", "value": 1.0},
            # user 3: click with no view at all
            {"event_id": 31, "ts": "2024-01-01T00:05:00Z", "user_id": 3, "event_type": "click", "value": 1.0},
        ],
    )
    events = read_event_stream(spark, src)
    views = events.filter(F.col("event_type") == "view")
    clicks = events.filter(F.col("event_type") == "click")
    joined = attribute_clicks_to_views(views, clicks, within_minutes=10)
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT user_id, view_id, click_id, lag_sec FROM attr_out").collect()
    assert [(r.user_id, r.view_id, r.click_id, r.lag_sec) for r in rows] == [
        (1, 10, 11, 180)
    ]


def test_event_bus_sink_delivers_and_keeps_history(spark, tmp_path):
    """Lifecycle bus: foreachBatch NDJSON fan-out with checkpointed
    at-least-once delivery; ring-buffer history query returns the
    newest n events."""
    from memories_spark.streaming.bus import (
        event_bus_sink,
        read_lifecycle_stream,
        recent_history,
    )

    src = str(tmp_path / "bus_in")
    out = str(tmp_path / "bus_out")
    ckpt = str(tmp_path / "bus_ckpt")
    _write_events(
        src,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00Z", "action": "added", "memory_id": 10, "source": "a/x"},
            {"event_id": 2, "ts": "2024-01-01T00:01:00Z", "action": "updated", "memory_id": 10, "source": "a/x"},
        ],
    )
    q = event_bus_sink(read_lifecycle_stream(spark, src), out, ckpt)
    q.awaitTermination(120)

    # replaying the same input must not re-deliver (checkpoint)
    q2 = event_bus_sink(read_lifecycle_stream(spark, src), out, ckpt)
    q2.awaitTermination(120)

    _write_events(
        src,
        "b2.json",
        [{"event_id": 3, "ts": "2024-01-01T00:02:00Z", "action": "deleted", "memory_id": 11, "source": "a/y"}],
    )
    q3 = event_bus_sink(read_lifecycle_stream(spark, src), out, ckpt)
    q3.awaitTermination(120)

    hist = recent_history(spark, out, n=2).collect()
    assert [r.event_id for r in hist] == [3, 2]
    all_rows = spark.read.json(out).collect()
    assert sorted(r.event_id for r in all_rows) == [1, 2, 3]


def test_incremental_kmv_matches_batch(spark, tmp_path):
    """Streamed min-k merge must equal the batch KMV over the same
    data (merge associativity), and replays must be idempotent."""
    from memories_spark.functions.hashing import hex_frac_sql
    from memories_spark.streaming.events import (
        incremental_kmv_sink,
        kmv_estimate_from_state,
    )

    src = str(tmp_path / "kmv_events_in")
    state = str(tmp_path / "kmv_state")
    ckpt = str(tmp_path / "kmv_ckpt")
    k = 5

    def ev(i, user, day, etype):
        return {
            "event_id": i,
            "ts": f"2024-01-{day:02d}T00:00:00Z",
            "user_id": user,
            "event_type": etype,
            "value": 1.0,
        }

    # 12 distinct (user, day) keys for clicks (> k), 3 for views (< k)
    batch1 = [ev(i, i % 4, 1 + i % 3, "click") for i in range(8)]
    batch2 = [ev(100 + i, 10 + i, 5, "click") for i in range(8)]
    batch3 = [ev(200 + i, 50, 10 + i, "view") for i in range(3)]
    _write_events(src, "b1.json", batch1)
    q = incremental_kmv_sink(read_event_stream(spark, src), state, ckpt, k=k)
    q.awaitTermination(120)
    _write_events(src, "b2.json", batch2)
    _write_events(src, "b3.json", batch3)
    q2 = incremental_kmv_sink(read_event_stream(spark, src), state, ckpt, k=k)
    q2.awaitTermination(120)

    got = {
        r.event_type: r.kmv_estimate
        for r in kmv_estimate_from_state(spark, state, k=k).collect()
    }

    # batch twin over all the data at once
    all_events = spark.createDataFrame(
        [
            (e["event_type"], f"{e['user_id']}@{e['ts'][:10]}")
            for e in batch1 + batch2 + batch3
        ],
        "event_type string, key string",
    )
    fr = (
        all_events.select("event_type", F.md5("key").alias("h"))
        .distinct()
        .select("event_type", F.expr(hex_frac_sql("h")).alias("f"))
    )
    from pyspark.sql import Window as W

    ranked = fr.withColumn(
        "rn", F.row_number().over(W.partitionBy("event_type").orderBy("f"))
    )
    want = {
        r.event_type: r.est
        for r in ranked.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max(F.when(F.col("rn") == k, F.col("f"))).alias("fk"))
        .select(
            "event_type",
            F.round(
                F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
                    F.lit(float(k - 1)) / F.col("fk")
                ),
                4,
            ).alias("est"),
        )
        .collect()
    }
    assert got == want
    # views group is below k -> exact fallback
    assert got["view"] == 3.0

    # state stays O(k x groups)
    assert spark.read.parquet(state).count() <= 2 * k

    # replay with same checkpoint: no new files, state unchanged
    q3 = incremental_kmv_sink(read_event_stream(spark, src), state, ckpt, k=k)
    q3.awaitTermination(120)
    got2 = {
        r.event_type: r.kmv_estimate
        for r in kmv_estimate_from_state(spark, state, k=k).collect()
    }
    assert got2 == got


def test_funnel_stream_stateful(spark, tmp_path):
    """The streaming funnel emits one conversion per user, only when
    the stage order holds across micro-batches, and never twice."""
    from memories_spark.streaming.events import funnel_stream

    src = str(tmp_path / "funnel_events_in")

    def ev(i, user, minute, etype):
        return {
            "event_id": i,
            "ts": f"2024-01-01T00:{minute:02d}:00Z",
            "user_id": user,
            "event_type": etype,
            "value": 1.0,
        }

    # user 1: full ordered funnel split across batches
    # user 2: click BEFORE view -> that click must not count; no purchase
    # user 3: purchase with no click -> no conversion
    _write_events(
        src,
        "b1.json",
        [
            ev(1, 1, 1, "view"),
            ev(2, 1, 5, "click"),
            ev(3, 2, 1, "click"),
            ev(4, 2, 2, "view"),
            ev(5, 3, 1, "view"),
        ],
    )
    stream = read_event_stream(spark, src)
    q = (
        funnel_stream(stream)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT * FROM funnel_out").count() == 0  # nothing converted yet

    _write_events(
        src,
        "b2.json",
        [
            ev(6, 1, 9, "purchase"),   # completes user 1
            ev(7, 2, 3, "purchase"),   # user 2 never validly clicked
            ev(8, 3, 4, "purchase"),   # user 3 never clicked
            ev(9, 1, 20, "purchase"),  # second purchase: must NOT re-emit
        ],
    )
    q2 = (
        funnel_stream(read_event_stream(spark, src))
        .writeStream.format("memory")
        .queryName("funnel_out2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # NOTE: fresh query (no shared checkpoint) re-reads all files; the
    # state machine still must emit exactly one conversion for user 1.
    q2.awaitTermination(120)
    rows = spark.sql("SELECT * FROM funnel_out2").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.user_id == 1
    assert str(r.view_ts) == "2024-01-01 00:01:00"
    assert str(r.click_ts) == "2024-01-01 00:05:00"
    assert str(r.purchase_ts) == "2024-01-01 00:09:00"


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join: every micro-batch row is enriched from the
    broadcast dimension; unmatched keys survive as NULL (left join)."""
    from memories_spark.streaming.events import enrich_stream_with_dimension

    src = str(tmp_path / "enrich_events_in")
    _write_events(
        src,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:01:00Z", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T00:02:00Z", "user_id": 2, "event_type": "view", "value": 2.0},
            {"event_id": 3, "ts": "2024-01-01T00:03:00Z", "user_id": 99, "event_type": "click", "value": 3.0},
        ],
    )
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    q = (
        enrich_stream_with_dimension(read_event_stream(spark, src), dim)
        .writeStream.format("memory")
        .queryName("enriched_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: r.tier for r in spark.sql("SELECT * FROM enriched_out").collect()
    }
    assert got == {1: "gold", 2: "silver", 3: None}


def test_incremental_histogram_matches_batch(spark, tmp_path):
    """Streamed bin counts must equal the batch histogram over the
    same data, and a checkpointed re-run must not double-count."""
    from memories_spark.streaming.events import (
        histogram_quantiles_from_state,
        incremental_histogram_sink,
    )

    src = str(tmp_path / "hist_events_in")
    hist = str(tmp_path / "hist_state")
    ckpt = str(tmp_path / "hist_ckpt")
    lo, hi = 0.0, 100.0

    def ev(i, value):
        return {
            "event_id": i,
            "ts": "2024-01-01T00:00:00Z",
            "user_id": i,
            "event_type": "click",
            "value": value,
        }

    vals1 = [float(v) for v in range(0, 60, 3)]   # 20 values
    vals2 = [float(v) for v in range(60, 100, 2)] # 20 values
    _write_events(src, "b1.json", [ev(i, v) for i, v in enumerate(vals1)])
    q = incremental_histogram_sink(read_event_stream(spark, src), hist, ckpt, lo, hi)
    q.awaitTermination(120)
    _write_events(src, "b2.json", [ev(100 + i, v) for i, v in enumerate(vals2)])
    q2 = incremental_histogram_sink(read_event_stream(spark, src), hist, ckpt, lo, hi)
    q2.awaitTermination(120)

    got = {
        r.q: r.est_upper_edge
        for r in histogram_quantiles_from_state(spark, hist, lo, hi).collect()
    }

    # batch twin: same bins over all values at once
    import math
    all_vals = sorted(vals1 + vals2)
    width = (hi - lo) / 128
    want = {}
    for qq in (0.5, 0.9, 0.99):
        target = math.ceil(qq * len(all_vals))
        bins = sorted(min(int((v - lo) // width), 127) for v in all_vals)
        cum = 0
        counts = {}
        for b in bins:
            counts[b] = counts.get(b, 0) + 1
        for b in sorted(counts):
            cum += counts[b]
            if cum >= target:
                want[qq] = round(lo + (b + 1) * width, 6)
                break
    assert got == want, (got, want)

    # checkpointed re-run: no new batches -> state unchanged
    q3 = incremental_histogram_sink(read_event_stream(spark, src), hist, ckpt, lo, hi)
    q3.awaitTermination(120)
    got2 = {
        r.q: r.est_upper_edge
        for r in histogram_quantiles_from_state(spark, hist, lo, hi).collect()
    }
    assert got2 == got


def test_incremental_topk_matches_batch(spark, tmp_path):
    """Streamed per-type top-k leaderboard must equal the batch
    TakeOrdered over the same data, and replaying the stream into
    the same state must be a no-op (merge idempotency)."""
    from memories_spark.streaming.events import incremental_topk_sink

    src = str(tmp_path / "topk_events_in")
    state = str(tmp_path / "topk_state")
    ckpt = str(tmp_path / "topk_ckpt")
    k = 3

    def ev(i, etype, cents):
        return {
            "event_id": i,
            "ts": "2024-01-05T00:00:00Z",
            "user_id": i % 7,
            "event_type": etype,
            "value": cents / 100.0,
        }

    batch1 = [ev(i, "click", 100 + 7 * i) for i in range(6)]
    batch2 = [ev(100 + i, "click", 90 + 11 * i) for i in range(6)]
    batch3 = [ev(200 + i, "view", 500 - i) for i in range(2)]
    _write_events(src, "b1.json", batch1)
    q = incremental_topk_sink(read_event_stream(spark, src), state, ckpt, k=k)
    q.awaitTermination(120)
    _write_events(src, "b2.json", batch2)
    _write_events(src, "b3.json", batch3)
    q2 = incremental_topk_sink(read_event_stream(spark, src), state, ckpt, k=k)
    q2.awaitTermination(120)

    got = {
        (r.event_type, r.event_id, r.cents)
        for r in spark.read.parquet(state).collect()
    }

    all_rows = spark.createDataFrame(
        [
            (e["event_type"], e["event_id"], int(round(e["value"] * 100)))
            for e in batch1 + batch2 + batch3
        ],
        "event_type string, event_id long, cents long",
    )
    from pyspark.sql import Window as W

    want = {
        (r.event_type, r.event_id, r.cents)
        for r in all_rows.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("event_type").orderBy(
                    F.col("cents").desc(), F.col("event_id").asc()
                )
            ),
        )
        .filter(F.col("rn") <= k)
        .select("event_type", "event_id", "cents")
        .collect()
    }
    assert got == want
    assert len([r for r in got if r[0] == "click"]) == k
    assert len([r for r in got if r[0] == "view"]) == 2

    # replay the whole directory into the same state: must not change
    ckpt2 = str(tmp_path / "topk_ckpt2")
    q3 = incremental_topk_sink(read_event_stream(spark, src), state, ckpt2, k=k)
    q3.awaitTermination(120)
    again = {
        (r.event_type, r.event_id, r.cents)
        for r in spark.read.parquet(state).collect()
    }
    assert again == want


def test_sessionize_stream_skewed_session_soak(spark, tmp_path):
    """Round-8 soak for the stateful twin: ONE user delivers 10^5
    events in a single micro-batch — 50k two-event sessions separated
    by >gap. Pins the per-group contract: the matcher state stays one
    open-session tuple (O(active users), never O(events)), the whole
    hot key streams through applyInPandasWithState in one pass, and
    49,999 closed sessions emit (the final pair stays open in
    state)."""
    from datetime import datetime, timedelta

    from memories_spark.streaming import read_event_stream, sessionize_stream

    src = str(tmp_path / "soak_in")
    base = datetime(2024, 1, 1)
    n_pairs = 50_000
    events = []
    for i in range(n_pairs):
        t0 = base + timedelta(hours=i)
        for j, t in enumerate((t0, t0 + timedelta(seconds=60))):
            events.append(
                {
                    "event_id": 2 * i + j,
                    "ts": t.strftime("%Y-%m-%dT%H:%M:%SZ"),
                    "user_id": 1,
                    "event_type": "click",
                    "value": 1.0,
                }
            )
    _write_events(src, "soak.json", events)
    stream = (
        spark.readStream.schema(read_event_stream(spark, src).schema)
        .json(src)
    )
    sessions = sessionize_stream(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_soak")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql(
        "SELECT count(*) AS n, sum(n_events) AS tot, min(n_events) AS lo, "
        "max(n_events) AS hi FROM sessions_soak"
    ).collect()[0]
    assert rows.n == n_pairs - 1, rows
    assert rows.lo == rows.hi == 2
    assert rows.tot == 2 * (n_pairs - 1)
