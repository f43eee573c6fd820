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

Semantics note vs stdlib: orjson rejects NaN/Infinity literals and
integers beyond 64 bits. Both rejections match Go ``encoding/json``
(the reference decoder, service.go:79) more closely than stdlib does, so
the swap moves parity toward the reference, not away from it.
"""

from __future__ import annotations

try:  # pragma: no cover - which branch runs depends on the environment
    from orjson import loads
except ImportError:  # pragma: no cover
    from json import loads  # type: ignore[assignment]

__all__ = ["loads"]
