"""Corpus IR statistics: TF-IDF keywords, BM25 scoring, PMI
co-occurrence, and the inverted index.

A pretraining-data pipeline needs relevance machinery in several
places: per-document salient terms (keyword metadata for curation /
domain routing), query-against-corpus scoring (targeted subset mining,
e.g. "pull the documents that look like math"), distributional
statistics (PMI co-occurrence, the word2vec/GloVe preprocessing
table), and the retrieval-side posting lists. All are classic IR
statistics (Sparck Jones 1972; Robertson et al., TREC-3 BM25; Church &
Hanks 1990) built from the same ``ws_tokens`` normalization every
other text operator shares, so vocabularies line up across the engine.

Scale contract (both operators):
* term-frequency table = one explode + one map-side-combinable
  ``groupBy(key, token)`` count — the only corpus-sized shuffle;
* document-frequency / IDF table is VOCABULARY-sized, derived from the
  tf table (never a second corpus scan) and hash-joined back (AQE
  broadcasts it when small);
* corpus totals (N docs, average length) are a one-row aggregate
  cross-joined in — no driver collect, the plan stays fully lazy;
* the per-document top-k window partitions by document key, bounded by
  per-document DISTINCT vocabulary, not corpus size.

Cross-engine float discipline (the ``ngram_perplexity`` rules): counts
are exact integers; ``ln``/division results round to 9 dp before any
reduce; per-document sums run in decimal(28,9) so reduce order cannot
perturb totals; final scores round to 6 dp. Derived double constants
(k1+1, 1-b) are computed ONCE in Python and embedded via ``repr`` in
the oracle so both engines mix identical literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import ws_tokens


def _tf(df: DataFrame, text_col: str, key_col: str) -> DataFrame:
    c = F.coalesce(F.col(text_col), F.lit(""))
    return (
        df.select(F.col(key_col), F.explode(ws_tokens(c)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy(key_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_terms(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    top_k: int = 5,
    min_df: int = 2,
    max_df_frac: float = 0.8,
) -> DataFrame:
    """Top-k TF-IDF terms per document:
    ``score = tf * round(ln(N / df), 9)`` over tokens whose document
    frequency lies in ``[min_df, floor(max_df_frac * N)]`` (the classic
    rare-noise / stopword band-pass). Returns
    (key_col, token, tf, score, rank) with rank 1..top_k ordered by
    (score desc, token asc) — a total order, so the cut is
    deterministic across engines and partitionings.
    """
    # tf is consumed twice (document frequencies + the score join) — cut
    # its lineage so the corpus tokenize+count runs once, not once per
    # consumer (the ngram_perplexity discipline)
    tf = _tf(df, text_col, key_col).localCheckpoint(eager=False)
    n_docs = df.select(F.count(F.lit(1)).alias("n"))
    dfreq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df_t") >= F.lit(int(min_df)))
            & (
                F.col("df_t").cast("double")
                <= F.floor(F.lit(float(max_df_frac)) * F.col("n").cast("double"))
            )
        )
        .select(
            "token",
            "df_t",
            F.round(
                F.log(F.col("n").cast("double") / F.col("df_t").cast("double")), 9
            ).alias("idf"),
        )
    )
    scored = tf.join(dfreq, "token").select(
        key_col,
        "token",
        "tf",
        F.round(F.col("tf").cast("double") * F.col("idf"), 6).alias("score"),
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(top_k)))
        .select(key_col, "token", "tf", "score", "rank")
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    min_df: int = 1,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Inverted index: (token, df_t, postings) with postings the SORTED
    distinct document keys containing the token — the retrieval-side
    artifact BM25/decontamination lookups consume. The ``[min_df,
    floor(max_df_frac * N)]`` band-pass is what BOUNDS the posting rows:
    stopword-frequency tokens (the only unbounded-row risk — a token in
    every document would collect the whole corpus into one array) are
    excluded by ``max_df_frac`` BEFORE the list aggregation, so the
    worst surviving row holds ``max_df_frac * N`` keys; shrink the
    fraction (or shard postings by key range) as N grows. One corpus
    (key, token) dedup shuffle + one vocabulary-sized aggregation.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    kt = (
        df.select(F.col(key_col), F.explode(ws_tokens(c)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token", key_col)
        .agg(F.count(F.lit(1)).alias("_tf"))
        .localCheckpoint(eager=False)  # consumed by the band AND postings
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n"))
    # the band-pass runs BEFORE the list aggregation — a stopword row
    # must never be built only to be thrown away, or the bound is fiction
    band = (
        kt.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df_t") >= F.lit(int(min_df)))
            & (
                F.col("df_t").cast("double")
                <= F.floor(F.lit(float(max_df_frac)) * F.col("n").cast("double"))
            )
        )
        .select("token", "df_t")
    )
    return (
        kt.join(band, "token")
        .groupBy("token", "df_t")
        .agg(F.sort_array(F.collect_list(key_col)).alias("postings"))
        .select("token", "df_t", "postings")
    )


def cooccurrence_pmi(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    window: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """Windowed token co-occurrence counts with pointwise mutual
    information — the word2vec/GloVe preprocessing statistic (Church &
    Hanks 1990): every UNORDERED token pair within ``window`` positions
    counts once per occurrence;
    ``pmi = round(ln( (co/T) / ((c_a/N) * (c_b/N)) ), 9)`` with T total
    pair occurrences and N total token occurrences. Returns
    (a, b, co, pmi) for pairs with ``co >= min_count``, a <= b.

    The pair stream is built IN-ROW from the materialized token array
    (one explode of per-position window slices — no self-join on
    position, which at 100 TB would shuffle the token stream twice and
    join corpus-sized frames). The only corpus-sized shuffles are the
    two map-side-combinable counts (pairs, unigrams); unigram and total
    tables are vocabulary-/scalar-sized and joined back. The ratio is
    division/multiplication only (exactly rounded IEEE) with a single
    ``ln`` rounded to 9 dp, so both engines agree bit-for-bit.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = df.select(ws_tokens(c).alias("_toks"))
    # slice from the materialized column, not the tokenizer expression —
    # referencing ws_tokens() inside the lambda would re-evaluate it per
    # element (the O(n^2) trap ngram_perplexity documents)
    pair_arr = F.flatten(
        F.transform(
            F.col("_toks"),
            lambda w, i: F.transform(
                F.slice(F.col("_toks"), i + F.lit(2), F.lit(int(window))),
                lambda v: F.struct(
                    F.least(w, v).alias("a"), F.greatest(w, v).alias("b")
                ),
            ),
        )
    )
    # T is the total over ALL pair occurrences (the probability space),
    # not just the frequent ones — count first, filter for output only;
    # both the totals aggregate and the output consume the count, so cut
    # its lineage (one pair build, not two)
    pairs_all = (
        toks.select(F.explode(pair_arr).alias("p"))
        .select("p.a", "p.b")
        .filter(F.col("a") != "")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("co"))
        .localCheckpoint(eager=False)
    )
    pairs = pairs_all.filter(F.col("co") >= F.lit(int(min_count)))
    uni = (
        df.select(F.explode(ws_tokens(c)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
        .localCheckpoint(eager=False)  # consumed twice (totals + join)
    )
    totals = F.broadcast(
        uni.agg(F.sum("cu").alias("n")).crossJoin(
            pairs_all.agg(F.sum("co").alias("t"))
        )
    )
    x = (F.col("co").cast("double") / F.col("t").cast("double")) / (
        (F.col("ca").cast("double") / F.col("n").cast("double"))
        * (F.col("cb").cast("double") / F.col("n").cast("double"))
    )
    return (
        pairs.join(uni.select(F.col("w").alias("a"), F.col("cu").alias("ca")), "a")
        .join(uni.select(F.col("w").alias("b"), F.col("cu").alias("cb")), "b")
        .crossJoin(totals)
        .select("a", "b", "co", F.round(F.log(x), 9).alias("pmi"))
    )


def bm25_scores(
    df: DataFrame,
    query: list[str],
    text_col: str = "text",
    key_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 document scores for a fixed token query:
    per matched term,
    ``idf = round(ln(1 + (N - df + 0.5) / (df + 0.5)), 9)``
    ``part = round(idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl / avgdl))), 9)``
    summed per document in decimal(28,9), final round to 6 dp. Returns
    (key_col, n_matched, bm25) for documents matching >= 1 query token.

    The query is a tiny Python list: the token filter lands BEFORE the
    (key, token) aggregation, so the per-term shuffle carries only
    query-token rows. Document lengths need the unfiltered token stream,
    so the tokenizer runs twice (once per aggregation chain) over
    column-pruned scans — the aggregated dl and tf tables are then
    lineage-cut because each is consumed twice downstream. At 100 TB the
    dl table is the corpus-row-count frame and the scored frame is
    |query|-bounded per document.
    """
    terms = sorted({t.lower() for t in query})
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = (
        df.select(F.col(key_col), F.explode(ws_tokens(c)).alias("token"))
        .filter(F.col("token") != "")
    )
    dl = toks.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("dl")
    ).localCheckpoint(eager=False)  # consumed by stats AND the score join
    tf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy(key_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # consumed by dfreq AND the output
    )
    stats = df.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        dl.agg(F.sum("dl").alias("sum_dl"))
    )
    dfreq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .crossJoin(F.broadcast(stats))
        .select(
            "token",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n").cast("double") - F.col("df_t").cast("double") + F.lit(0.5))
                    / (F.col("df_t").cast("double") + F.lit(0.5))
                ),
                9,
            ).alias("idf"),
            (F.col("sum_dl").cast("double") / F.col("n").cast("double")).alias(
                "avgdl"
            ),
        )
    )
    k1p1 = float(k1) + 1.0
    one_minus_b = 1.0 - float(b)
    part = F.round(
        F.col("idf")
        * (F.col("tf").cast("double") * F.lit(k1p1))
        / (
            F.col("tf").cast("double")
            + F.lit(float(k1))
            * (
                F.lit(one_minus_b)
                + F.lit(float(b)) * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        ),
        9,
    ).cast("decimal(28,9)")
    return (
        tf.join(dfreq, "token")
        .join(dl, key_col)
        .select(F.col(key_col), F.col("token"), part.alias("part"))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(F.sum("part").cast("double"), 6).alias("bm25"),
        )
    )


class PostingStore:
    """Incremental inverted-index store — the daily-ingest variant of
    ``inverted_index``, completing the incremental family (MinHash /
    SimHash / SemDeDup / CC / changesets): the index IS a (token, key)
    pair table persisted as parquet partitioned by
    ``tb = pmod(xxhash64(token), n_buckets)`` and ``batch_id``, so

    * ``ingest`` tokenizes ONLY the new batch and appends its pairs via
      dynamic partition overwrite of the batch's own partitions —
      replaying a batch byte-identically is a no-op (idempotent under
      at-least-once delivery, the streaming-dedup discipline);
    * ``lookup`` reads one token's postings with a partition-pruned scan
      (the ``tb`` filter prunes at the source — never a full-store read);
    * ``posting_lists`` materializes the banded index; document
      frequencies use ``count(distinct key)`` so an accidental re-ingest
      of a document under a NEW batch_id degrades gracefully instead of
      inflating df (each document should still ingest in exactly one
      batch — the global-uniqueness precondition all incremental kernels
      share).

    Wire into Structured Streaming with
    ``stream.writeStream.foreachBatch(lambda df, i: store.ingest(df, i))``.
    """

    def __init__(self, root: str, n_buckets: int = 64):
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        self.root = root
        self.n_buckets = int(n_buckets)

    def _tb(self) -> Column:
        return F.pmod(F.xxhash64(F.col("token")), F.lit(self.n_buckets))

    def ingest(
        self,
        docs: DataFrame,
        batch_id: int,
        text_col: str = "text",
        key_col: str = "doc_id",
    ) -> None:
        c = F.coalesce(F.col(text_col), F.lit(""))
        kt = (
            docs.select(F.col(key_col).alias("key"), F.explode(ws_tokens(c)).alias("token"))
            .filter(F.col("token") != "")
            .distinct()
        )
        (
            kt.withColumn("tb", self._tb())
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("tb", "batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.root)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.root)

    def lookup(self, spark: SparkSession, token: str) -> DataFrame:
        """Sorted postings for one token: the tb equality below is a
        PARTITION filter, so the scan touches 1/n_buckets of the store."""
        tb = self.read(spark).filter(
            (F.col("tb") == F.pmod(F.xxhash64(F.lit(token)), F.lit(self.n_buckets)))
            & (F.col("token") == F.lit(token))
        )
        return tb.select("key").distinct().orderBy("key")

    def posting_lists(
        self,
        spark: SparkSession,
        min_df: int = 1,
        max_df_frac: float = 0.5,
        n_docs: int | None = None,
    ) -> DataFrame:
        """The banded (token, df_t, postings) index over everything
        ingested so far — same band-pass-BEFORE-aggregation discipline as
        the batch ``inverted_index``. ``n_docs`` is the corpus document
        count for the max_df bound (pass it from the ingest ledger; when
        None it is computed with one exact distinct count)."""
        kt = self.read(spark).select("token", "key").distinct().localCheckpoint(
            eager=False
        )  # consumed by the band AND the postings aggregation
        if n_docs is None:
            n_docs = kt.select("key").distinct().count()
        band = (
            kt.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df_t"))
            .filter(
                (F.col("df_t") >= F.lit(int(min_df)))
                & (
                    F.col("df_t").cast("double")
                    <= F.floor(F.lit(float(max_df_frac)) * F.lit(float(int(n_docs))))
                )
            )
        )
        return (
            kt.join(band, "token")
            .groupBy("token", "df_t")
            .agg(F.sort_array(F.collect_list("key")).alias("postings"))
            .select("token", "df_t", "postings")
        )
