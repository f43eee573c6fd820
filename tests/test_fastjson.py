"""The shared JSON decoder must route payloads identically whichever
library is installed: valid/quarantine decisions cannot depend on an
optional dependency. orjson rejects NaN/Infinity literals and integers
beyond 64 bits; the stdlib fallback mirrors both rejections."""

import importlib
import sys

import pytest

import smartlogic_concordance_transformer_spark.fastjson as fastjson

ACCEPT = [
    '{"a": 1}',
    '{"a": [1, 2.5, "x"]}',
    '{"big": 18446744073709551615}',   # u64 max — stays int
    '{"neg": -9223372036854775808}',   # i64 min — stays int
    '{"big": 18446744073709551616}',   # u64 max + 1 — overflows to float64
    '{"neg": -9223372036854775809}',   # i64 min - 1 — overflows to float64
    '{"@graph": []}',
]
REJECT = [
    '{"a": NaN}',
    '{"a": Infinity}',
    '{"a": -Infinity}',
    "{not json",
    "",
]


def _fallback_loads():
    """Reload fastjson with orjson masked so the stdlib branch is active."""
    saved = sys.modules.pop("orjson", None)
    sys.modules["orjson"] = None  # import orjson -> ImportError
    try:
        mod = importlib.reload(fastjson)
        return mod.loads
    finally:
        if saved is not None:
            sys.modules["orjson"] = saved
        else:
            del sys.modules["orjson"]
        importlib.reload(fastjson)


@pytest.mark.parametrize("loads_kind", ["installed", "stdlib_fallback"])
def test_routing_is_environment_independent(loads_kind):
    loads = fastjson.loads if loads_kind == "installed" else _fallback_loads()
    for payload in ACCEPT:
        assert isinstance(loads(payload), dict), payload
    for payload in REJECT:
        with pytest.raises(Exception):
            loads(payload)


def test_values_identical_across_branches():
    fb = _fallback_loads()
    for payload in ACCEPT:
        assert fastjson.loads(payload) == fb(payload)