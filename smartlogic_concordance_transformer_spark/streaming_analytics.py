"""Streaming analytics operators: watermarked windowed aggregation and
custom stateful sessionization.

Not present in the reference (its only stream is stateless per-message);
these are the Structured Streaming primitives a production event pipeline
needs and the north rule's 'new design' surface: event-time watermarks for
late data, tumbling-window aggregates, and ``applyInPandasWithState`` for
operators Spark lacks natively (session assembly with a custom gap rule).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with an
    event-time watermark bounding state for late data. Works identically
    on a static frame (for the DuckDB-style oracle) and a stream."""
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w")["start"].alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: Iterable[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key.

    On a stream, ``dropDuplicatesWithinWatermark`` bounds the dedup state
    to the watermark horizon — the only way exact dedup is possible on an
    unbounded stream (global dropDuplicates would grow state forever). On
    a static frame it degrades to plain dropDuplicates, so batch backfill
    and the streaming job share one code path.
    """
    keys = list(keys)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(gap_ms: int):
    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_ms, end_ms, n = state.get
        else:
            start_ms = end_ms = -1
            n = 0
        out = []
        ts = (
            pd.concat(list(pdfs))["ts"]
            .astype("datetime64[ms]")
            .astype("int64")
            .sort_values()
        )
        for t in ts:
            if start_ms < 0:
                start_ms, end_ms, n = t, t, 1
            elif t - end_ms > gap_ms:
                out.append((user_id, start_ms, end_ms, n, True))
                start_ms, end_ms, n = t, t, 1
            else:
                end_ms, n = t, n + 1
        if state.hasTimedOut:
            if start_ms >= 0:
                out.append((user_id, start_ms, end_ms, n, True))
            state.remove()
        else:
            state.update((int(start_ms), int(end_ms), int(n)))
            state.setTimeoutDuration(gap_ms)
            if start_ms >= 0:
                out.append((user_id, start_ms, end_ms, n, False))  # open session snapshot
        if not out:
            yield pd.DataFrame(columns=[f.name for f in SESSION_SCHEMA.fields])
            return
        df = pd.DataFrame(
            out, columns=["user_id", "session_start", "session_end", "n_events", "closed"]
        )
        df["session_start"] = pd.to_datetime(df["session_start"], unit="ms")
        df["session_end"] = pd.to_datetime(df["session_end"], unit="ms")
        yield df

    return fn


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: per-user session assembly with a
    gap-timeout rule, via ``applyInPandasWithState``.

    Emits closed sessions as soon as the in-batch data proves the gap,
    plus an open-session snapshot per user per micro-batch (closed=false);
    a processing-time timeout flushes sessions of users who go silent.
    State per user is three longs — millions of concurrent users fit in
    executor memory, and state is shuffled by user_id (the natural key).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60 * 1000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "10 minutes",
    prefix: str = "r_",
) -> DataFrame:
    """Stream-stream event correlation: every (left, right) pair with the
    same ``key`` and ``right.ts`` in ``[left.ts + lower, left.ts +
    upper]`` — the attribution-window join (click -> purchase within N
    minutes). Inner join; right columns come back ``prefix``-renamed.

    On streams this is Spark's watermarked stream-stream join: BOTH sides
    get an event-time watermark and the join carries the explicit time-
    range condition, which is what lets the state store evict — a
    streaming join without the range bound would buffer both streams
    forever. State per key is bounded by ``watermark + (upper - lower)``
    of event-time. On static frames the identical expression runs as a
    plain join, which is how the DuckDB oracle checks it row-for-row.

    Scale contract: the join shuffles both streams by ``key`` once
    (stock stream-stream join exchange); the time-range predicate is
    evaluated inside the keyed state store, never as a cross join.
    """
    lw = left.withWatermark(ts_col, watermark) if left.isStreaming else left
    rw = right.withWatermark(ts_col, watermark) if right.isStreaming else right
    r_ren = rw.select(
        F.col(key).alias(f"{prefix}{key}"),
        F.col(ts_col).alias(f"{prefix}{ts_col}"),
        *[
            F.col(c).alias(f"{prefix}{c}")
            for c in rw.columns
            if c not in (key, ts_col)
        ],
    )
    lo = F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {lower}")
    hi = F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {upper}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{prefix}{key}"))
        & (F.col(f"r.{prefix}{ts_col}") >= lo)
        & (F.col(f"r.{prefix}{ts_col}") <= hi)
    )
    return lw.alias("l").join(r_ren.alias("r"), cond).drop(f"{prefix}{key}")


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Funnel analysis (the product-analytics staple): per user, how far
    through the ordered ``steps`` sequence their events progress under
    greedy earliest-match semantics — step i+1 matches the FIRST event of
    that type strictly after the step-i match, optionally bounded to
    ``within`` (an INTERVAL string) of the step-1 timestamp. Returns
    ``(user, steps_completed, t_first)`` for users who matched step 1;
    equivalent to the chained-min formulation (t2 = min ts of step-2
    events after t1, ...), which is what the SQL oracle replays.

    Scale shape: one shuffle (groupBy user); each user's step events sort
    and fold IN-ROW (``sort_array`` + one ``aggregate`` pass — the doc-
    rebuild discipline), bounded by a single user's event count, never
    corpus-sized. Events not in ``steps`` are filtered before the shuffle.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = events.filter(F.col(type_col).isin(steps))
    per_user = ev.groupBy(user_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("y")))
        ).alias("_evs")
    )
    bound = F.expr(f"INTERVAL {within}") if within is not None else None
    step_lits = [F.lit(s) for s in steps]

    def advance(acc, e):
        # acc: (i, t1, tk) — steps completed, step-1 time, last-step time
        matches_next = F.lit(False)
        for idx, s in enumerate(step_lits):
            matches_next = F.when(acc["i"] == idx, e["y"] == s).otherwise(matches_next)
        ok = (
            (acc["i"] < F.lit(len(steps)))
            & matches_next
            & ((acc["i"] == 0) | (e["t"] > acc["tk"]))
        )
        if bound is not None:
            ok = ok & ((acc["i"] == 0) | (e["t"] <= acc["t1"] + bound))
        return F.when(
            ok,
            F.struct(
                (acc["i"] + 1).alias("i"),
                F.when(acc["i"] == 0, e["t"]).otherwise(acc["t1"]).alias("t1"),
                e["t"].alias("tk"),
            ),
        ).otherwise(acc)

    init = F.struct(
        F.lit(0).alias("i"),
        F.lit(None).cast("timestamp").alias("t1"),
        F.lit(None).cast("timestamp").alias("tk"),
    )
    folded = per_user.select(
        user_col, F.aggregate("_evs", init, advance).alias("_f")
    )
    return folded.filter(F.col("_f.i") >= 1).select(
        user_col,
        F.col("_f.i").alias("steps_completed"),
        F.col("_f.t1").alias("t_first"),
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every consecutive event pair within a user's
    (ts, tiebreak)-ordered history, count (from_type, to_type) and the
    row-conditional probability
    ``p = round(n / sum(n) over from_type, 6)``.

    The successor lookup is a ``lead`` window per user — each task holds
    ONE user's events, bounded by per-user history, never corpus size
    (the funnel/doc-rebuild discipline). Transition counts are a
    map-side-combinable groupBy over the (from, to) pair stream; the
    per-from_type totals are a STATE-COUNT-sized aggregate joined back
    (AQE-broadcastable), not a second window. n/total is one exact IEEE
    division so both engines emit identical doubles.

    ``tiebreak_col`` must make (key, ts, tiebreak) unique or the lead
    order — hence the counts — would be nondeterministic.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    pairs = (
        events.select(key_col, ts_col, tiebreak_col, type_col)
        .withColumn("_to", F.lead(type_col).over(w))
        .filter(F.col("_to").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"), F.col("_to").alias("to_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # consumed twice (totals + output)
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("_tot").cast("double"), 6
            ).alias("prob"),
        )
    )
