"""Result canonicalization — parity with GQueryPlan::beautify
(src/plan/query/QueryPlan.cpp:69-102) and the golden-file row format
(test/query/expect.out):

- vertex row → ``[key, {json props sorted by key}]``; no props → ``[key, null]``
- edge row → ``['src', --, dst]`` / ``[... , {props}]``
- datetime → ``"0d<epoch>"`` (integral epochs printed without decimal point)
- binary → ``"0b<base64>"``
- vectors → JSON arrays with ``.0`` on integral doubles (``[0.0,0.5]``)
- unicode preserved (no \\u escapes)
"""

from __future__ import annotations

import base64
import json
import math
from typing import Any

from .catalog import (K_BINARY, K_DATETIME, K_INTEGER, K_NUMBER, K_VECTOR,
                      GroupMeta)


def _fmt_double(x: float) -> str:
    if x != x or math.isinf(x):
        return "null"
    if x == int(x) and abs(x) < 1e15:
        return f"{int(x)}.0"
    return repr(x)


def _fmt_epoch(x: float) -> str:
    if x == int(x):
        return f"0d{int(x)}"
    return f"0d{x}"


def _json_scalar(v: Any, kind: str | None) -> str:
    import datetime as _dt
    if v is None:
        return "null"
    if kind == K_DATETIME:
        if isinstance(v, _dt.datetime):  # bulk-registered timestamp columns
            v = v.replace(tzinfo=_dt.timezone.utc).timestamp()
        return json.dumps(_fmt_epoch(float(v)), ensure_ascii=False)
    if kind == K_BINARY:
        return json.dumps("0b" + base64.b64encode(bytes(v)).decode(), ensure_ascii=False)
    if kind == K_VECTOR:
        return "[" + ",".join(_fmt_double(float(e)) for e in v) + "]"
    if kind == K_NUMBER:
        return _fmt_double(float(v))
    if kind == K_INTEGER:
        return str(int(v))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, float):
        return _fmt_double(v)
    if isinstance(v, bytes):
        return json.dumps("0b" + base64.b64encode(v).decode(), ensure_ascii=False)
    if isinstance(v, list):
        return "[" + ",".join(_json_scalar(e, None) for e in v) + "]"
    return json.dumps(v, ensure_ascii=False)


def props_json(props: dict[str, Any], meta: GroupMeta) -> str:
    items = [(k, v) for k, v in sorted(props.items()) if v is not None]
    if not items:
        return "null"
    parts = [f"{json.dumps(k, ensure_ascii=False)}:"
             f"{_json_scalar(v, meta.props.get(k))}" for k, v in items]
    return "{" + ",".join(parts) + "}"


def vertex_row(key: Any, props: dict[str, Any], meta: GroupMeta) -> str:
    return f"[{key}, {props_json(props, meta)}]"


def _edge_key(k: Any) -> str:
    return str(k) if isinstance(k, int) else f"'{k}'"


def edge_row(src: Any, direction: str, dst: Any,
             props: dict[str, Any], meta: GroupMeta) -> str:
    body = f"[{_edge_key(src)}, {direction}, {_edge_key(dst)}"
    pj = props_json(props, meta)
    if pj != "null":
        body += f", {pj}"
    return body + "]"
