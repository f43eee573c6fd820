"""Deterministic dataset splitting for training pipelines.

A train/test split at 100 TB must be (a) reproducible across runs and
engines with no RNG state, (b) a pure per-row projection (no shuffle, no
join, no sampling pass), and (c) stable under re-partitioning and resume.
Hash-assignment gives all three: the split is a function of the row key
alone.

The bucket is the first two hex chars of ``md5(salt ':' key)`` — 256
buckets compared lexicographically against a threshold prefix, so any
engine (including the DuckDB oracle) reproduces the assignment exactly
without 64-bit hex→int conversion quirks. Granularity is 1/256 ≈ 0.4%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(key, salt: str = "split") -> Column:
    """(0..255) bucket as a 2-char lowercase hex string."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(salt + ":"), c.cast("string"))), 1, 2)


def md5_long60(key: Column | str, salt: str) -> Column:
    """Deterministic 60-bit nonnegative integer from ``md5(salt ':' key)``
    — the engine-portable hash bridge for anything that needs more than
    ``split_bucket``'s 256 levels. 15 hex chars = 60 bits, inside the
    signed-64 range of BOTH engines, so Spark
    ``conv(substr(md5(x),1,15),16,10)`` and DuckDB
    ``cast('0x' || substr(md5(x),1,15) as bigint)`` agree bit-for-bit
    (verified by the pure-hashlib parity tests). Still a zero-shuffle
    per-row projection."""
    c = F.col(key) if isinstance(key, str) else key
    hx = F.substring(F.md5(F.concat(F.lit(salt + ":"), c.cast("string"))), 1, 15)
    return F.conv(hx, 16, 10).cast("long")


def train_test_split(
    df: DataFrame,
    key_col: str = "doc_id",
    test_buckets: int = 26,
    salt: str = "split",
) -> DataFrame:
    """+ ``split`` column: 'test' for ``test_buckets``/256 of rows
    (26/256 ≈ 10.2%), 'train' otherwise. Zero-shuffle projection; the
    same (key, salt) always lands on the same side, so reruns, resumes,
    and different engines agree row-for-row."""
    if not 0 <= test_buckets <= 256:
        raise ValueError("test_buckets must be in [0, 256]")
    b = split_bucket(key_col, salt)
    if test_buckets == 256:
        # format(256, '02x') is the 3-char '100', which 2-char hex buckets
        # compare against lexicographically (only '00'..'10' sort below
        # it) — everything is test, so say exactly that
        is_test = F.lit(True)
    else:
        is_test = b < format(test_buckets, "02x")
    return df.withColumn(
        "split", F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, int],
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the pretraining-mix
    operator (keep 100% of books, 25% of web, ...), with the same
    guarantees as ``train_test_split``: reproducible with no RNG, a pure
    per-row projection (zero shuffle, zero sampling pass — the fractions
    dictionary folds into a literal CASE expression, never a join), and
    stable under re-partitioning and resume.

    ``fractions`` maps stratum value -> kept buckets out of 256
    (64 = 25%). Strata absent from the dict are kept whole. A row is
    kept iff its hash bucket sorts below its stratum's threshold, so the
    kept subset is NESTED as a fraction grows (raising web 64 -> 128
    only adds rows — the curriculum-friendly property).
    """
    for stratum, buckets in fractions.items():
        if not 0 <= buckets <= 256:
            raise ValueError(f"fractions[{stratum!r}] must be in [0, 256]")
    b = split_bucket(key_col, salt)
    keep = F.lit(True)
    for stratum, buckets in fractions.items():
        in_stratum = F.col(strata_col) == F.lit(stratum)
        if buckets == 256:
            stratum_keep = F.lit(True)
        else:
            stratum_keep = b < format(buckets, "02x")
        keep = F.when(in_stratum, stratum_keep).otherwise(keep)
    return df.filter(keep)


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    text_col: str = "text",
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
    bucket_chars: int = 2,
) -> DataFrame:
    """Domain mixing by token budget: pretraining mixtures are specified
    as tokens-per-source (the Pile / Llama recipe shape), not row
    fractions — take documents from each source, in a deterministic
    hash order, until the source's cumulative whitespace-token count
    reaches its budget. Returns the selected rows plus ``n_tokens`` and
    ``cum_tokens`` (the running total INCLUDING the row, so the last
    selected row may overshoot the budget — take-until, not take-while-
    under, ensuring a budget > 0 always yields at least one document).

    Deterministic and engine-reproducible: the order inside a source is
    ``(md5(salt ':' key), key)`` — no RNG state — so reruns, resumes,
    and the DuckDB oracle select the identical document set.

    Scale contract — two-phase prefix sum. A single
    ``Window.partitionBy(source)`` cumsum would hash-partition EVERY
    document of a source into one task (window functions never
    range-partition), serializing terabytes per task with a few dozen
    sources at corpus scale. Instead the running total is split by an
    ORDER-ALIGNED range bucket: the first ``bucket_chars`` hex chars of
    the md5 order key itself (uniform by md5 randomness, and every row
    of bucket '00' sorts before every row of '01' — a hash of the key
    would scatter the sort order and per-bucket offsets could not
    reconstruct the global cumsum). Phase 1 aggregates per-(source,
    bucket) token subtotals from a slim (source, bucket, n_tokens)
    projection; a window over that TINY table (≤ sources × 16^chars
    rows) yields each bucket's starting offset. Phase 2 broadcast-joins
    the offsets back — INNER, so buckets whose offset already meets the
    budget are pruned before any sort (the take-until early exit) — and
    runs the cumsum window within (source, bucket) only: 16^chars-way
    parallelism per source instead of one task. Cost: the corpus is
    scanned (and tokenized) twice, the classic two-phase trade — two
    column-pruned scans beat one scan plus a single-task external sort
    of a whole source.
    """
    srcs = list(budgets)
    if not srcs:
        raise ValueError("budgets must name at least one source")
    if not 1 <= bucket_chars <= 8:
        raise ValueError("bucket_chars must be in [1, 8]")
    from pyspark.sql import Window

    h = F.md5(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    )
    n_tok = F.size(
        F.split(F.trim(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " ")), " ")
    )
    budget = F.create_map(
        *[x for s in srcs for x in (F.lit(s), F.lit(int(budgets[s])))]
    )[F.col(source_col)]
    base = (
        df.filter(F.col(source_col).isin(srcs))
        .withColumn("_h", h)
        .withColumn("_b", F.substring(F.col("_h"), 1, bucket_chars))
        .withColumn("n_tokens", n_tok.cast("long"))
    )
    # phase 1: per-bucket subtotals, then each bucket's starting offset
    # = sum of all LOWER buckets of the same source. The window here
    # runs over the aggregated table only — at most
    # len(srcs) * 16**bucket_chars rows, driver-tiny by construction.
    w_off = (
        Window.partitionBy(source_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy(source_col, "_b")
        .agg(F.sum("n_tokens").alias("_sub"))
        .withColumn("_off", F.coalesce(F.sum("_sub").over(w_off), F.lit(0)))
        # bucket pruning: a row is selected iff its cum-before < budget,
        # and cum-before >= the bucket's offset — so a bucket whose
        # offset already meets the budget contributes nothing; dropping
        # it here (inner join below) skips its sort entirely.
        .filter(F.col("_off") < budget)
        .select(source_col, "_b", "_off")
    )
    # phase 2: cumsum within (source, bucket) — the exchange key now
    # carries the bucket, so a source spreads over 16^chars tasks.
    w_loc = (
        Window.partitionBy(source_col, "_b")
        .orderBy("_h", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        base.join(F.broadcast(offsets), [source_col, "_b"], "inner")
        .withColumn("cum_tokens", F.col("_off") + F.sum("n_tokens").over(w_loc))
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget)
        .drop("_h", "_b", "_off")
    )
    return out


def exp_clock_priority(
    key: Column | str, weight: Column | str, salt: str = "ws"
) -> Column:
    """Efraimidis–Spirakis priority for weighted sampling WITHOUT
    replacement: ``-ln(u) / w`` with ``u = (h + 1) / 2^60`` drawn
    deterministically from ``md5(salt ':' key)`` — an Exp(w) arrival
    clock per row; the k smallest clocks are exactly a weighted sample
    without replacement (Efraimidis & Spirakis 2006, keys ``u^(1/w)``
    — same ordering under -ln/w). No RNG state: reruns, resumes, and
    the DuckDB oracle draw the identical u per key. u is in (0, 1] so
    ln never sees 0; weights must be > 0 (caller-checked)."""
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (md5_long60(key, salt) + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    return -F.log(u) / w.cast("double")


def _assert_priority_separation(priorities: list[float], what: str) -> None:
    """ln() is the one non-exactly-rounded operation in the priority
    (Java Math.log and libm log may differ in the last ulp), so the
    cross-engine contract is: orderings agree PROVIDED no two adjacent
    priorities sit within ~1 ulp. Assert a 1e-9 relative gap between
    every adjacent pair that decides the output (the IVF 1-ulp
    separation discipline) — astronomically safe margin over 2^-52,
    and a loud failure instead of a silent oracle flake if a corpus
    ever produces a near-tie."""
    ps = sorted(priorities)
    for a, b in zip(ps, ps[1:]):
        if not (b - a) > 1e-9 * max(abs(b), 1e-300):
            raise AssertionError(
                f"{what}: adjacent sampling priorities {a!r} and {b!r} are "
                "within float-rounding distance — cross-engine ordering is "
                "not certifiable; change the salt"
            )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "ws",
    check_separation: bool = True,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of k rows
    (inclusion odds proportional to ``weight_col``, no row twice) —
    the pretraining shape 'sample 1M documents, long documents
    proportionally more often' that a rows-fraction sampler cannot
    express. Returns (key, weight, rank), rank 1 = smallest clock.

    Scale contract: ``orderBy(priority).limit(k)`` compiles to
    TakeOrderedAndProject — a per-partition k-row heap plus one driver
    merge of k rows per partition, NO full sort and NO shuffle of the
    corpus; the only data movement is k·P slim rows to the driver. The
    rank column is a window over the ALREADY k-row result (bounded by
    k, single tiny task — not the single-task-per-key anti-pattern,
    there is no key and only k rows). The priority itself is never
    emitted (ln is the one op that may differ cross-engine in the last
    ulp); ``check_separation`` collects the top k+1 clocks once and
    asserts every ordering-deciding gap exceeds float-rounding noise,
    making the DuckDB comparison sound rather than lucky."""
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    pr = exp_clock_priority(key_col, weight_col, salt)
    base = df.withColumn("_pr", pr)
    if check_separation:
        edge = [
            r["_pr"]
            for r in base.select("_pr").orderBy("_pr", key_col).limit(k + 1).collect()
        ]
        _assert_priority_separation(edge, f"weighted_sample(k={k})")
    top = base.orderBy("_pr", key_col).limit(k)
    w = Window.orderBy("_pr", key_col)
    return top.select(
        key_col,
        F.col(weight_col).cast("long").alias("weight"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


def stratified_weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "ws",
    bucket_chars: int = 2,
    check_separation: bool = True,
) -> DataFrame:
    """Per-stratum weighted sample without replacement: the k smallest
    Exp(w) clocks WITHIN each stratum (k docs per source, long docs
    favoured). Returns (strata, key, weight, rank), rank 1..k inside
    each stratum.

    Scale contract — two-phase per-key top-k, because the obvious
    ``Window.partitionBy(source)`` rank funnels every row of a source
    through ONE task's sort (the token_budget_mix r6 lesson). Phase 1
    ranks within (source, md5-bucket): 16^chars tasks per source, each
    sorting only its bucket slice, and keeps rows ranked ≤ k — a
    bucket's local top-k certainly contains every global top-k member
    that hashed into it. Phase 2 re-ranks the survivors within the
    source — at most k · 16^chars slim rows per source by construction,
    a bounded reducer row no matter the corpus size — and keeps rank
    ≤ k. The corpus is scanned once; no collect_list ever holds an
    unbounded group."""
    if k <= 0:
        raise ValueError("k must be positive")
    if not 1 <= bucket_chars <= 8:
        raise ValueError("bucket_chars must be in [1, 8]")
    from pyspark.sql import Window

    h = F.md5(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string"))
    )
    base = df.withColumn(
        "_pr", exp_clock_priority(key_col, weight_col, salt)
    ).withColumn("_b", F.substring(h, 1, bucket_chars))
    w1 = Window.partitionBy(strata_col, "_b").orderBy("_pr", key_col)
    survivors = (
        base.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_b")
    )
    if check_separation:
        w_edge = Window.partitionBy(strata_col).orderBy("_pr", key_col)
        edge = (
            survivors.withColumn("_r", F.row_number().over(w_edge))
            .filter(F.col("_r") <= k + 1)
            .select(strata_col, "_pr")
            .collect()
        )
        by_stratum: dict[str, list[float]] = {}
        for r in edge:
            by_stratum.setdefault(r[strata_col], []).append(r["_pr"])
        for stratum, ps in by_stratum.items():
            _assert_priority_separation(
                ps, f"stratified_weighted_sample({stratum!r}, k={k})"
            )
    w2 = Window.partitionBy(strata_col).orderBy("_pr", key_col)
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            strata_col,
            key_col,
            F.col(weight_col).cast("long").alias("weight"),
            "rank",
        )
    )


def pack_documents(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: str = "pack",
    bucket_chars: int = 2,
) -> DataFrame:
    """Global sequence packing for pretraining: concatenate every
    document's tokens in a deterministic md5 order and cut the stream
    into fixed ``seq_len``-token windows (the GPT-style packed-batch
    layout — documents may straddle a window boundary; the trainer
    resets attention at document starts). Emits per document its global
    token ``start`` offset, ``bin_first``/``bin_last`` (the windows it
    touches) and ``bin_offset`` (position within the first window) —
    the index a packing writer needs to place every doc without ever
    materializing the concatenated stream.

    All-integer arithmetic (token counts, one global prefix sum,
    div/mod) — the DuckDB oracle matches hash-exactly with no float
    discipline needed.

    Scale contract — the ``token_budget_mix`` bucketed two-phase prefix
    sum, global instead of per-source: a single-partition cumsum window
    over the corpus is the textbook scale-killer, so phase 1 aggregates
    per-bucket token subtotals keyed by the ORDER-ALIGNED md5-prefix
    bucket (every row of bucket '00' precedes every row of '01'), a
    window over that ≤ 16^chars-row table yields bucket offsets, and
    phase 2 broadcast-joins them back for a within-bucket cumsum —
    16^chars-way parallelism, two column-pruned scans, no unbounded
    task."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if not 1 <= bucket_chars <= 8:
        raise ValueError("bucket_chars must be in [1, 8]")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    n_tok = F.size(
        F.split(
            F.trim(
                F.regexp_replace(
                    F.coalesce(F.col(text_col), F.lit("")), r"\s+", " "
                )
            ),
            " ",
        )
    )
    base = (
        df.withColumn("_h", h)
        .withColumn("_b", F.substring(F.col("_h"), 1, bucket_chars))
        .withColumn("n_tokens", n_tok.cast("long"))
    )
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        base.groupBy("_b")
        .agg(F.sum("n_tokens").alias("_sub"))
        # single-partition window is FINE here: the aggregated table has
        # at most 16^chars rows regardless of corpus size
        .withColumn("_off", F.coalesce(F.sum("_sub").over(w_off), F.lit(0)))
        .select("_b", "_off")
    )
    w_loc = (
        Window.partitionBy("_b")
        .orderBy("_h", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    L = int(seq_len)
    return (
        base.join(F.broadcast(offsets), "_b", "inner")
        .withColumn("_cum", F.col("_off") + F.sum("n_tokens").over(w_loc))
        .withColumn("start", F.col("_cum") - F.col("n_tokens"))
        .select(
            key_col,
            "n_tokens",
            "start",
            F.expr(f"start div {L}").alias("bin_first"),
            F.expr(f"(_cum - 1) div {L}").alias("bin_last"),
            F.pmod(F.col("start"), F.lit(L)).cast("long").alias("bin_offset"),
        )
    )
