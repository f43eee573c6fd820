"""Web-corpus URL operations: normalization and host extraction.

Web-scale dedup runs URL-level passes BEFORE any content pass (the
CommonCrawl recipe: two fetches of the same normalized URL are the same
document — no shingles needed), and per-host aggregation drives crawl
budgeting and domain blocklists. Both are pure per-row projections
(zero shuffle, engine-reproducible string ops) so a URL-dedup of 100 TB
is one scan + one 8-byte-key exchange, and host stats are one
map-side-combinable count.

Normalization rules (the RFC 3986 §6 safe set, applied identically in
the DuckDB oracle):
  * drop the fragment (``#...``),
  * lowercase the scheme and authority (NOT the path — case-sensitive
    on most origins),
  * strip a default port (``:80`` for http, ``:443`` for https),
  * empty path -> ``/``,
  * sort query parameters bytewise (``?b=2&a=1`` == ``?a=1&b=2`` for
    virtually all origins; the rare order-sensitive endpoint is a
    caller-level opt-out), drop an empty query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_URL_RE = r"^([^:/?#]+)://([^/?#]*)([^?#]*)"


def url_host(url: Column | str) -> Column:
    """Lowercased authority without port — the per-host aggregation key."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(
        F.lower(F.regexp_extract(c, _URL_RE, 2)), r":\d+$", ""
    )


def normalize_url(url: Column | str) -> Column:
    """Canonical URL per the module-docstring rule set. Null-safe
    (null -> null); a string that does not parse as ``scheme://...``
    comes back unchanged minus its fragment (conservative: never
    invent structure)."""
    c = F.col(url) if isinstance(url, str) else url
    defrag = F.regexp_replace(c, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(defrag, _URL_RE, 1))
    auth = F.lower(F.regexp_extract(defrag, _URL_RE, 2))
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.regexp_replace(auth, r":80$", ""),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.regexp_replace(auth, r":443$", ""),
    ).otherwise(auth)
    path = F.regexp_extract(defrag, _URL_RE, 3)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(defrag, r"\?([^#]*)", 1)
    qsorted = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda p: p != "")), "&"
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qsorted != "", F.concat(F.lit("?"), qsorted)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", defrag).otherwise(rebuilt)
