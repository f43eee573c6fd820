"""Watermarked windowed aggregation + stateful sessionization."""

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from smartlogic_concordance_transformer_spark.streaming_analytics import (
    sessionize,
    windowed_event_counts,
)


def test_windowed_counts_static_matches_manual(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = windowed_event_counts(ev, window="1 hour")
    total = got.agg(F.sum("n")).first()[0]
    assert total == ev.count()
    # one window row per (hour, type); manual check on one slice
    row = got.orderBy("window_start", "event_type").first()
    manual = ev.filter(
        (F.date_trunc("hour", "ts") == row.window_start) & (F.col("event_type") == row.event_type)
    ).count()
    assert row.n == manual


def test_windowed_counts_streaming_with_watermark(spark, tmp_path):
    base = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        {"event_id": i, "ts": (base + timedelta(seconds=30 * i)).isoformat(sep=" "),
         "user_id": i % 3, "event_type": "click", "value": 1.0, "props": "{}"}
        for i in range(8)
    ]
    ind = tmp_path / "in"
    ind.mkdir()
    with open(ind / "b0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).json(str(ind))
    out = windowed_event_counts(stream, window="1 minute", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts").collect()
    # 8 events 30s apart fill 4 one-minute windows (2 events each); with a
    # 1-minute watermark the final availableNow flush closes windows ending
    # <= max_ts - 1min = 12:02:30 -> exactly the 12:00 and 12:01 windows.
    # Later windows are correctly held open for late data.
    assert sorted((r.window_start.minute, r.n) for r in got) == [(0, 2), (1, 2)]


def test_sessionize_stateful(spark, tmp_path):
    base = datetime(2026, 1, 1, 9, 0, 0)
    mk = lambda uid, minutes: {
        "event_id": uid * 100 + minutes,
        "ts": (base + timedelta(minutes=minutes)).isoformat(sep=" "),
        "user_id": uid, "event_type": "e", "value": 0.0, "props": "{}",
    }
    # user 1: two sessions separated by a 120-minute gap; user 2: one session
    rows = [mk(1, 0), mk(1, 5), mk(1, 10), mk(1, 130), mk(1, 135), mk(2, 0)]
    ind = tmp_path / "in"
    ind.mkdir()
    with open(ind / "b0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).json(str(ind))
    q = (
        sessionize(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sessions").collect()
    closed = [(r.user_id, r.n_events) for r in got if r.closed]
    open_ = [(r.user_id, r.n_events) for r in got if not r.closed]
    assert (1, 3) in closed                 # first session closed by the in-batch gap
    assert (1, 2) in open_                  # second session still open
    assert (2, 1) in open_                  # user 2's single-event session open


def test_dedup_stream_within_watermark(spark, tmp_path):
    from smartlogic_concordance_transformer_spark.streaming_analytics import dedup_stream

    base = datetime(2026, 1, 1, 8, 0, 0)
    mk = lambda eid, sec: {
        "event_id": eid, "ts": (base + timedelta(seconds=sec)).isoformat(sep=" "),
        "user_id": 1, "event_type": "e", "value": 0.0, "props": "{}",
    }
    # event 1 duplicated twice within the watermark horizon; 2 and 3 unique
    rows = [mk(1, 0), mk(1, 10), mk(2, 20), mk(1, 30), mk(3, 40)]
    ind = tmp_path / "in"
    ind.mkdir()
    with open(ind / "b0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = spark.readStream.schema(schema).json(str(ind))
    q = (
        dedup_stream(stream, keys=["event_id"], watermark="5 minutes")
        .writeStream.format("memory")
        .queryName("dedup_s")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.event_id for r in spark.sql("select * from dedup_s").collect())
    assert got == [1, 2, 3]
    # static frame shares the code path via plain dropDuplicates
    static = spark.createDataFrame(
        [(1, 1.0), (1, 2.0), (2, 3.0)], "event_id long, value double"
    ).withColumn("ts", F.current_timestamp())
    assert dedup_stream(static, keys=["event_id"]).count() == 2


def test_stream_interval_join_static_semantics(spark):
    from smartlogic_concordance_transformer_spark.streaming_analytics import (
        stream_interval_join,
    )

    base = datetime(2026, 1, 1, 12, 0, 0)
    clicks = spark.createDataFrame(
        [(1, base, 100), (2, base, 101)], "user_id long, ts timestamp, event_id long"
    )
    purch = spark.createDataFrame(
        [
            (1, base + timedelta(minutes=5), 200),   # inside window
            (1, base + timedelta(minutes=11), 201),  # beyond upper
            (1, base - timedelta(minutes=1), 202),   # before lower
            (2, base + timedelta(minutes=10), 203),  # boundary inclusive
            (3, base + timedelta(minutes=1), 204),   # wrong key
        ],
        "user_id long, ts timestamp, event_id long",
    )
    got = {
        (r.event_id, r.r_event_id)
        for r in stream_interval_join(clicks, purch).collect()
    }
    assert got == {(100, 200), (101, 203)}


def test_stream_interval_join_streaming_matches_static(spark, tmp_path):
    """The real stream-stream join (both sides watermarked, state evicted
    by the time-range bound) must produce exactly the static join's rows,
    including matches that pair rows from DIFFERENT micro-batches."""
    from smartlogic_concordance_transformer_spark.streaming_analytics import (
        stream_interval_join,
    )

    base = datetime(2026, 1, 1, 12, 0, 0)
    clicks = [
        {"user_id": u, "ts": (base + timedelta(minutes=m)).isoformat(sep=" "),
         "event_id": 100 + i}
        for i, (u, m) in enumerate([(1, 0), (2, 3), (1, 20), (3, 25)])
    ]
    purchases = [
        {"user_id": u, "ts": (base + timedelta(minutes=m)).isoformat(sep=" "),
         "event_id": 200 + i}
        for i, (u, m) in enumerate([(1, 5), (2, 14), (1, 28), (3, 24), (2, 4)])
    ]
    lind, rind = tmp_path / "l", tmp_path / "r"
    lind.mkdir(); rind.mkdir()
    # split across files so matches cross micro-batch boundaries
    for name, rows, d in [
        ("b0.json", clicks[:2], lind), ("b1.json", clicks[2:], lind),
        ("b0.json", purchases[:2], rind), ("b1.json", purchases[2:], rind),
    ]:
        with open(d / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    schema = "user_id long, ts timestamp, event_id long"
    ls = spark.readStream.schema(schema).json(str(lind))
    rs = spark.readStream.schema(schema).json(str(rind))
    out = stream_interval_join(ls, rs)
    q = (
        out.writeStream.format("memory")
        .queryName("sij")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.event_id, r.r_event_id)
        for r in spark.sql("select * from sij").collect()
    }
    lstat = spark.createDataFrame(
        [(c["user_id"], datetime.fromisoformat(c["ts"]), c["event_id"]) for c in clicks],
        schema,
    )
    rstat = spark.createDataFrame(
        [(p["user_id"], datetime.fromisoformat(p["ts"]), p["event_id"]) for p in purchases],
        schema,
    )
    want = {
        (r.event_id, r.r_event_id)
        for r in stream_interval_join(lstat, rstat).collect()
    }
    assert got == want and want, (got, want)


def test_funnel_steps_semantics(spark):
    from smartlogic_concordance_transformer_spark.streaming_analytics import funnel_steps

    base = datetime(2026, 1, 1, 12)
    rows = [
        (1, base, "click"), (1, base + timedelta(minutes=5), "view"),
        (1, base + timedelta(minutes=9), "purchase"),          # full funnel
        (2, base, "view"), (2, base + timedelta(minutes=1), "click"),  # pre-click view ignored
        (3, base, "click"), (3, base + timedelta(minutes=2), "view"),
        (3, base + timedelta(minutes=30), "purchase"),          # outside window
        (4, base, "view"),                                      # no step 1 -> excluded
        (5, base, "click"), (5, base, "view"),                  # same-ts: strictly-after rule
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.user_id: (r.steps_completed, r.t_first)
        for r in funnel_steps(df, ["click", "view", "purchase"], within="10 minutes").collect()
    }
    assert got == {
        1: (3, base),
        2: (1, base + timedelta(minutes=1)),
        3: (2, base),
        5: (1, base),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel_steps(df, ["click"])


def test_event_transitions_golden(spark):
    from smartlogic_concordance_transformer_spark.streaming_analytics import (
        event_transitions,
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: click -> view -> view -> purchase
        (1, t0, 1, "click"), (1, t0 + dt.timedelta(minutes=1), 2, "view"),
        (1, t0 + dt.timedelta(minutes=2), 3, "view"),
        (1, t0 + dt.timedelta(minutes=3), 4, "purchase"),
        # user 2: same-timestamp tie broken by event_id: click(5) then view(6)
        (2, t0, 5, "click"), (2, t0, 6, "view"),
        # user 3: single event -> no transitions
        (3, t0, 7, "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {(r.from_type, r.to_type): (r.n, r.prob)
           for r in event_transitions(df).collect()}
    assert got == {
        ("click", "view"): (2, 1.0),
        ("view", "view"): (1, 0.5),
        ("view", "purchase"): (1, 0.5),
    }


def test_resample_gapfill_golden(spark):
    from smartlogic_concordance_transformer_spark.datapipe.timeseries import (
        resample_gapfill,
    )
    import datetime as dt
    from decimal import Decimal
    import pytest as _pytest

    d0 = dt.datetime(2024, 3, 1, 10, 0)
    rows = [
        # user 1: days 1, 1, 4 -> days 2 and 3 are gaps
        (1, d0, 2.5), (1, d0 + dt.timedelta(hours=3), 1.25),
        (1, d0 + dt.timedelta(days=3), 10.0),
        # user 2: single day -> one-row grid
        (2, d0 + dt.timedelta(days=1), 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {(r.user_id, r.bucket.day): (r.n, r.total, r.filled)
           for r in resample_gapfill(df, unit="day").collect()}
    t1 = Decimal("3.750000")
    assert got == {
        (1, 1): (2, t1, t1),
        (1, 2): (0, None, t1),          # gap: count 0, total null, ffill
        (1, 3): (0, None, t1),
        (1, 4): (1, Decimal("10.000000"), Decimal("10.000000")),
        (2, 2): (1, Decimal("7.000000"), Decimal("7.000000")),
    }
    with _pytest.raises(ValueError, match="unit"):
        resample_gapfill(df, unit="fortnight")


def test_anomalous_buckets_flags_spike_and_silence(spark):
    from smartlogic_concordance_transformer_spark.datapipe.timeseries import (
        anomalous_buckets,
    )
    import datetime as dt

    d0 = dt.datetime(2024, 5, 1, 12, 0)
    rows = []
    # user 1: steady 10/day for 12 days, except day 6 empty (silence)
    # and day 9 a 100-value spike
    for i in range(12):
        if i == 6:
            continue
        v = 100.0 if i == 9 else 10.0
        rows.append((1, d0 + dt.timedelta(days=i), v))
    # user 2: constant value every day -> zero variance, must drop out
    for i in range(5):
        rows.append((2, d0 + dt.timedelta(days=i), 3.0))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {(r.user_id, r.bucket.day): float(r.z)
           for r in anomalous_buckets(df, unit="day", z_threshold=2.0).collect()}
    assert set(got) == {(1, 10)}, got       # only the spike clears 2 sigma
    assert got[(1, 10)] > 2.0
    # at a looser threshold the silent day flags too (negative z)
    loose = {(r.user_id, r.bucket.day): float(r.z)
             for r in anomalous_buckets(df, unit="day", z_threshold=0.5).collect()}
    assert loose[(1, 7)] < -0.5             # day index 6 -> May 7
    assert all(u != 2 for u, _ in loose), "zero-variance key must drop out"
