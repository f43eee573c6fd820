"""As-of (most-recent-prior) join — the time-series operator Spark has no
built-in for.

For each left row, attach the single right row with the greatest
``right.on <= left.on`` within the same ``by`` keys (pandas
``merge_asof`` / DuckDB ``ASOF JOIN`` semantics, direction='backward').

Scalable shape: **tag + union + running last-non-null window** — one
shuffle on (by, on) total, no per-key driver loop, and no range-join
candidate blowup (a naive ``l JOIN r ON r.ts <= l.ts`` explodes to
O(|l|·|r|) per key before picking the max). Right rows at the exact left
timestamp are visible (<=), matching DuckDB/pandas defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
    seq_col: str | None = None,
    tolerance: int | float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + ``{prefix}{col}`` for each right value column (and
    ``{prefix}{on}``, the matched right timestamp); nulls when no right
    row precedes. ``by`` defaults to no keying (one global timeline).

    ``tolerance``: pandas ``merge_asof`` parity — a match farther than
    ``tolerance`` from ``left.on`` is discarded (the whole matched struct
    nulls atomically, same no-tearing rule as the fill). A pure
    post-window projection: the plan shape (one shuffle) is unchanged.

    ``direction``: 'backward' (default: greatest ``right.on <=
    left.on``), 'forward' (smallest ``right.on >= left.on``), or
    'nearest' (whichever of the two is closer; backward wins exact
    ties, pandas' rule). Forward is the backward join over the negated
    timeline, so both share the identical one-shuffle window plan;
    nearest composes the two (two window passes) and picks per row.

    Tie-break among multiple right rows sharing the same ``(by, on)``:
    the row with the greatest ``seq_col`` wins. When ``seq_col`` is None
    a ``monotonically_increasing_id`` over the right frame is used, which
    reproduces pandas ``merge_asof``'s keep-last-in-input-order rule as
    long as the right frame's partitioning is deterministic (a plain
    table scan is); pass an explicit ``seq_col`` for an order guarantee
    that survives arbitrary upstream shuffles.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    if tolerance is not None and tolerance < 0:
        # pandas merge_asof rejects only NEGATIVE tolerance (zero means
        # exact-timestamp matches only) — same rule here; a negative
        # bound would otherwise silently null every match
        raise ValueError(f"asof_join: tolerance must be non-negative, got {tolerance!r}")
    by = list(by or [])
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by and c != seq_col]
    # output-collision check runs UP FRONT for every direction: the
    # forward/nearest reductions rename columns before recursing, so the
    # recursion's own check only sees the renamed frames ('_neg_'/'_b_'/
    # '_f_' names) and a left column that equals an output name (e.g.
    # 'asof_ts') would silently emit a duplicate column in the final
    # select instead of raising like the backward base case
    collide = {f"{prefix}{c}" for c in [on, *value_cols]}.intersection(left.columns)
    if collide:
        raise ValueError(
            f"asof_join: output column(s) {sorted(collide)} collide with left frame "
            f"columns; pass a different prefix"
        )
    if direction in ("forward", "nearest"):
        # both reductions negate the timeline; negation of a timestamp
        # would fail deep inside the plan with an opaque analyzer error —
        # validate here with an actionable message
        from pyspark.sql.types import NumericType

        for side, frame in (("left", left), ("right", right)):
            t = frame.schema[on].dataType
            if not isinstance(t, NumericType):
                raise TypeError(
                    f"asof_join: direction={direction!r} requires a numeric "
                    f"'on' column (the negated-timeline reduction), but the "
                    f"{side} frame's {on!r} is {t.simpleString()}; pre-cast "
                    "timestamps, e.g. unix_micros(col)"
                )
    if direction == "nearest":
        # run both directions and pick the closer match per row; backward
        # wins exact-distance ties (pandas merge_asof semantics). The two
        # matched structs null/fill atomically, so the pick cannot tear.
        # A generated row id keys the recombination so duplicate (by, on)
        # left rows cannot cross-multiply.
        if "_rid" in left.columns or "_rid" in right.columns:
            raise ValueError("asof_join: '_rid' is reserved for direction='nearest'")
        # lineage cut: the id must be assigned ONCE — two independent
        # executions of monotonically_increasing_id could differ if the
        # source repartitions between them
        lid = left.withColumn(
            "_rid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
        bwd = asof_join(
            lid, right, on=on, by=by, value_cols=value_cols,
            prefix="_b_", seq_col=seq_col, tolerance=tolerance,
            direction="backward",
        )
        # the matched columns are exactly what the recursion ADDED — a
        # left column that happens to start with "_b_" stays untouched
        vcols = [c[len("_b_"):] for c in bwd.columns if c not in lid.columns]
        fwd = asof_join(
            lid, right, on=on, by=by,
            value_cols=[c for c in vcols if c != on],
            prefix="_f_", seq_col=seq_col, tolerance=tolerance,
            direction="forward",
        ).select("_rid", *[f"_f_{c}" for c in vcols])
        both = bwd.join(fwd, "_rid")
        d_b = F.col(on) - F.col(f"_b_{on}")
        d_f = F.col(f"_f_{on}") - F.col(on)
        use_b = F.col(f"_f_{on}").isNull() | (
            F.col(f"_b_{on}").isNotNull() & (d_b <= d_f)
        )
        return both.select(
            *[c for c in left.columns],
            *[
                F.when(use_b, F.col(f"_b_{c}")).otherwise(F.col(f"_f_{c}")).alias(
                    f"{prefix}{c}"
                )
                for c in vcols
            ],
        )
    if direction == "forward":
        # mirror the timeline: forward-asof(on) == backward-asof(-on)
        # (requires a numeric ``on``; negation of int64/double is exact).
        # The seq is ALSO negated: backward keeps the greatest seq among
        # same-(by, on) right duplicates (pandas keep-LAST rule), and
        # pandas forward keeps the FIRST duplicate — mirroring the seq
        # makes smallest-original-seq win. Matched timestamp un-negated
        # on the way out; output column order matches the backward form.
        neg_on = f"_neg_{on}"
        if neg_on in left.columns or neg_on in right.columns or "_negseq" in right.columns:
            raise ValueError(
                f"asof_join: {neg_on!r}/'_negseq' are reserved for direction='forward'"
            )
        seq = F.col(seq_col).cast("long") if seq_col else F.monotonically_increasing_id()
        l_neg = left.withColumn(neg_on, -F.col(on)).drop(on)
        r_neg = (
            right.withColumn(neg_on, -F.col(on))
            .withColumn("_negseq", -seq)
            .drop(on, *([seq_col] if seq_col else []))
        )
        out = asof_join(
            l_neg, r_neg, on=neg_on, by=by,
            value_cols=value_cols, prefix=prefix, seq_col="_negseq",
            tolerance=tolerance, direction="backward",
        )
        lt = left.schema[on].dataType
        matched = [c for c in out.columns if c not in l_neg.columns]
        return out.select(
            *[
                (-F.col(neg_on)).cast(lt).alias(on) if c == on else F.col(c)
                for c in left.columns
            ],
            (-F.col(f"{prefix}{neg_on}")).cast(lt).alias(f"{prefix}{on}"),
            *[c for c in matched if c != f"{prefix}{neg_on}"],
        )

    reserved = {"_side", "_r", "_seq"}
    for df_name, cols in (("left", left.columns), ("right", right.columns)):
        bad = reserved.intersection(cols)
        if bad:
            raise ValueError(
                f"asof_join: {df_name} frame uses reserved internal column(s) {sorted(bad)}"
            )

    # ALL right-row values ride in ONE struct: last-non-null over the
    # struct picks the whole matched row atomically. Filling each column
    # independently would tear rows — a null value in the matched right
    # row would be silently replaced by a stale value from an older row
    # (and different columns could even come from different rows).
    r_struct = F.struct(F.col(on).alias(on), *[F.col(c).alias(c) for c in value_cols])
    seq = F.col(seq_col).cast("long") if seq_col else F.monotonically_increasing_id()
    l_tag = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_seq"),
        F.lit(None).cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in [on, *value_cols]
            )
            + ">"
        ).alias("_r"),
    )
    r_tag = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by and c != on
        ],
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        seq.alias("_seq"),
        r_struct.alias("_r"),
    ).select(*l_tag.columns)

    # right rows sort before left rows at equal timestamps so an
    # exact-timestamp right row is visible to the left row (<= semantics);
    # _seq makes the pick among same-(by, on) right duplicates
    # deterministic (greatest seq = last in right input order)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(), F.col("_seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        *[c for c in l_tag.columns if c not in ("_side", "_r")],
        F.col("_side"),
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    m = F.col("_r")
    if tolerance is not None:
        m = F.when(F.col(on) - F.col("_r")[on] <= F.lit(tolerance), F.col("_r"))
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *[c for c in left.columns],
            m[on].alias(f"{prefix}{on}"),
            *[m[c].alias(f"{prefix}{c}") for c in value_cols],
        )
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    chunk: int,
    how: str = "inner",
) -> DataFrame:
    """Points-in-interval join (geo-IP lookup, time-range enrichment,
    genomic overlap): every (point row, interval row) pair with
    ``lo <= point <= hi``, WITHOUT the cartesian product a naive
    ``ON p BETWEEN lo AND hi`` plans (Spark executes pure range
    predicates as BroadcastNestedLoop/Cartesian — O(|P|·|I|)).

    The classic chunking rewrite: the number line is cut into fixed
    ``chunk``-wide cells; each interval replicates to every cell it
    touches (``sequence(floor(lo/chunk), floor(hi/chunk))``), each point
    lands in exactly one cell, and the join becomes an equi-join on the
    cell id plus the exact range filter. A point matches an interval in
    exactly one cell — its own — so no post-join dedup is needed.

    Scale contract: the shuffle is an equi-join keyed by cell — partial,
    pruned, AQE-skew-splittable like any hash join. Interval replication
    is ``(hi - lo) / chunk + 1`` rows per interval: pick ``chunk`` near
    the typical interval width so replication stays O(1); a degenerate
    chunk (far below the widest interval) costs replication, never
    correctness. ``how='left'`` keeps unmatched points with null interval
    columns (one extra slim anti-join back onto the matched key set — the
    replicated cell stream stays inner).

    Columns: all point columns + all interval columns (names must not
    collide). Null points / null-bounded or inverted intervals drop
    (inner) — standard range-predicate semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if chunk <= 0:
        raise ValueError("chunk must be a positive integer")
    p = F.col(point_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    cells = intervals.filter(lo.isNotNull() & hi.isNotNull() & (lo <= hi)).withColumn(
        "_cell",
        F.explode(
            F.sequence(F.floor(lo / F.lit(chunk)), F.floor(hi / F.lit(chunk)))
        ),
    )
    pts = points.filter(p.isNotNull()).withColumn(
        "_cell", F.floor(p / F.lit(chunk))
    )
    matched = (
        pts.join(cells, "_cell")
        .filter((lo <= p) & (p <= hi))
        .drop("_cell")
    )
    if how == "inner":
        return matched
    # left: pass unmatched points through with nulls — the anti probe is
    # keyed by the point row's own columns, not the replicated stream
    missing = points.join(
        matched.select(*points.columns), points.columns, "anti"
    )
    for c in intervals.columns:
        missing = missing.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(missing)
