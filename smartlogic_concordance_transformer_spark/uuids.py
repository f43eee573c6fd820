"""Deterministic UUID derivation kernels — pure native Column expressions.

The reference derives concordance UUIDs two ways (empirically recovered and
verified against all 13 golden UUIDs in its test suite; see SURVEY.md 2.4):

* TME / DBpedia / Geonames / Wikidata ids
  (``/root/reference/smartlogic/service.go:298,308-310``):
  ``uuid.NewMD5(uuid.UUID{}, id)`` with pborman's zero-value UUID, which is a
  0-byte slice — i.e. plain ``MD5(id)`` with the v3 version nibble and
  RFC-4122 variant bits forced in.

* FACTSET ids (``service.go:305`` via FT uuid-utils-go):
  ``MD5(MD5(id))`` — the inner digest fed as raw 16 bytes — then the same
  version/variant surgery on the outer digest only.

Both are expressed here as **native Spark SQL column expressions** (``md5``,
``unhex``, ``substring``, ``translate``, ``concat``) so that:

* they run inside whole-stage codegen on the JVM — no Python in the hot
  path, no Arrow exchange, vectorized end to end;
* the identical expression is runnable in DuckDB for the oracle check
  (DuckDB's ``md5`` is VARCHAR-only, so only the single-MD5 kernel is
  oracle-checkable; the FACTSET kernel is pinned by pytest goldens).

Hex surgery on the 32-char lowercase digest ``h``:

* version: char 13 (1-indexed) := ``'3'``
* variant: char 17 := ``hex(8 | (nibble & 3))`` — a pure character map,
  ``translate(c, '0123456789abcdef', '89ab89ab89ab89ab')``
* hyphenate 8-4-4-4-12
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_VARIANT_MAP = "89ab89ab89ab89ab"


def _hex_to_uuid(h: Column) -> Column:
    """8-4-4-4-12 hyphenation + v3 version/variant bit surgery on a 32-char
    lowercase hex digest column."""
    return F.concat(
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-3"),
        F.substring(h, 14, 3),
        F.lit("-"),
        F.translate(F.substring(h, 17, 1), "0123456789abcdef", _VARIANT_MAP),
        F.substring(h, 18, 3),
        F.lit("-"),
        F.substring(h, 21, 12),
    )


def ft_md5_uuid(col: Column | str) -> Column:
    """TME / DBpedia / Geonames / Wikidata UUID: set_v3_bits(MD5(id)).

    Parity: /root/reference/smartlogic/service.go:298,308-310.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _hex_to_uuid(F.md5(c.cast("string")))


def ft_factset_uuid(col: Column | str) -> Column:
    """FACTSET UUID: set_v3_bits(MD5(raw_bytes(MD5(id)))).

    Parity: /root/reference/smartlogic/service.go:305 (uuid-utils-go
    DeriveFactsetUUID). The inner digest is fed to the outer MD5 as raw
    bytes, hence ``md5(unhex(md5(id)))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _hex_to_uuid(F.md5(F.unhex(F.md5(c.cast("string")))))


# SQL-fragment builders (same expressions as strings, for spark.sql and for
# the DuckDB oracle; both engines support md5/substr/translate/concat ||).

def ft_md5_uuid_sql(expr: str) -> str:
    """ANSI-ish SQL string computing ft_md5_uuid(expr); valid in both Spark
    SQL and DuckDB (used by the correctness oracle)."""
    h = f"md5({expr})"
    return (
        f"substr({h},1,8) || '-' || substr({h},9,4) || '-3' || substr({h},14,3)"
        f" || '-' || translate(substr({h},17,1),'0123456789abcdef','{_VARIANT_MAP}')"
        f" || substr({h},18,3) || '-' || substr({h},21,12)"
    )


def ft_factset_uuid_sql_spark(expr: str) -> str:
    """Spark-SQL-only fragment for the FACTSET kernel (DuckDB md5 cannot
    digest BLOBs, so this one has no SQL oracle)."""
    h = f"md5(unhex(md5({expr})))"
    return (
        f"substr({h},1,8) || '-' || substr({h},9,4) || '-3' || substr({h},14,3)"
        f" || '-' || translate(substr({h},17,1),'0123456789abcdef','{_VARIANT_MAP}')"
        f" || substr({h},18,3) || '-' || substr({h},21,12)"
    )


# Pure-Python reference implementations (test oracles, driver-side checks).

def _surgery_py(h: str) -> str:
    h = h[:12] + "3" + h[13:16] + _VARIANT_MAP[int(h[16], 16)] + h[17:]
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def ft_md5_uuid_py(value: str) -> str:
    return _surgery_py(hashlib.md5(value.encode("utf-8")).hexdigest())


def ft_factset_uuid_py(value: str) -> str:
    inner = hashlib.md5(value.encode("utf-8")).digest()
    return _surgery_py(hashlib.md5(inner).hexdigest())
