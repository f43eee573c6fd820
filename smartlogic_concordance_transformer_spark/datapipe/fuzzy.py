"""Fuzzy string matching via deletion-neighborhood blocking (SymSpell).

Entity labels that differ by one edit (typo'd concept names, off-by-one
serial identifiers) should concord in a KG build, but `levenshtein` over
all label pairs is O(V^2) — intractable at corpus vocabulary size. The
SymSpell observation (Garbe, 2012; same blocking family as the repo's
MinHash/SimHash banding): if ``lev(a, b) <= 1`` then ``a`` and ``b``
share at least one string in their deletion-1 neighborhoods
``D(t) = {t} ∪ {t with one char removed}``.

Proof by edit case: a deletion (b = a minus one char) puts b itself in
D(a) and trivially in D(b); an insertion is the symmetric case; a
substitution at position i makes "delete position i" from each side the
same string. So an equi-join on the neighborhood covers EVERY qualifying
pair, and an exact `levenshtein` verify over the candidates makes the
result exact — candidates are a superset, never a miss.

Scale contract (the repo's standard never-all-pairs shape):

* runs over the DISTINCT term set (vocabulary-sized, not corpus-sized);
* each term fans out to ``len(term) + 1`` variants, shuffled as an 8-byte
  ``xxhash64`` key — a hash collision can only ADD a candidate pair, and
  the verify filter removes it, so slimming the key is free;
* candidate volume is sum over variant buckets of C(bucket, 2) — bounded
  by how many vocabulary terms collapse onto one deletion, never V^2;
  no CartesianProduct appears in the plan (pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_neighborhood(term: Column | str) -> Column:
    """Array of the term plus every single-character-deletion variant,
    deduplicated (repeated chars collapse: D("aa") = {"aa", "a"}).
    In-row projection; callers must exclude empty terms (``sequence(1, 0)``
    is invalid)."""
    t = F.col(term) if isinstance(term, str) else term
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.concat(
            F.substring(t, F.lit(1), i - F.lit(1)),
            F.substring(t, i + F.lit(1), F.length(t)),
        ),
    )
    return F.array_union(F.array(t), deletions)


def fuzzy_match_pairs(df: DataFrame, term_col: str = "term") -> DataFrame:
    """All unordered distinct-term pairs with Levenshtein distance exactly 1,
    as ``(a, b, dist)`` with ``a < b``. Exact — the deletion-1 blocking is
    a proven superset of the qualifying pairs (module docstring) and every
    candidate is verified with the true distance. Distance radii > 1 need
    deletion-d neighborhoods (size O(len^d)); not implemented."""
    terms = (
        df.select(F.col(term_col).alias("term"))
        .filter(F.length("term") >= 1)
        .distinct()
    )
    variants = terms.select(
        "term",
        F.explode(deletion_neighborhood("term")).alias("_v"),
    ).select("term", F.xxhash64("_v").alias("_vh"))
    left = variants.alias("l")
    right = variants.alias("r")
    candidates = left.join(
        right,
        on=(F.col("l._vh") == F.col("r._vh")) & (F.col("l.term") < F.col("r.term")),
    ).select(F.col("l.term").alias("a"), F.col("r.term").alias("b"))
    # verify BEFORE deduplicating: the levenshtein runs map-side in the
    # join's own (wide, parallel) stage, not in the post-shuffle stage AQE
    # coalesces to a handful of partitions for the small distinct output —
    # measured 8.0 -> 5.2 s best-of-3 at sf0.1 for the identical result
    # set. The bounded (threshold=1) kernel prunes each DP to a diagonal
    # band; dist is a function of (a, b), so distinct-after-verify is the
    # same set.
    return (
        candidates.withColumn("dist", F.levenshtein("a", "b", 1))
        .filter(F.col("dist") == 1)
        .distinct()
    )
