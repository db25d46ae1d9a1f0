"""Recursive-descent parser: GQL text → typed AST.

Covers the reference grammar surface (``src/gql.y``): create/upset/query/
remove/drop/dump/show/ast/profile/import statements, predicate objects
($lt/$gt/$lte/$gte/$and/$or/$near/$geometry, IN-lists, wildcards, lambdas),
vertex/edge declarations (``[key, props]``, ``[src, --, dst]``,
``[src, --: {props}, dst]``), and walk patterns with path aggregates
(``['p102', <-: min(), 'p113']``).  Unlike the reference (which executes from
inside parser actions, gql.y:152-156), this is a clean parse → plan →
execute split.
"""

from __future__ import annotations

from typing import Any

from ..errors import GQLParseError
from . import lexer as L
from .ast import (
    STAR, AstStmt, BinaryLit, BudgetStmt, CallExpr, ChunkStmt, CreateStmt,
    DatetimeLit,
    CohortStmt, CurateStmt, DedupStmt, DropStmt,
    DumpStmt, EdgeConn, FunnelStmt, GeohashLit, GroupDef, ImportStmt,
    InferStmt, Lambda, LayoutStmt,
    MemberRef, QuantilesStmt, ReadRollupStmt, RetrieveStmt, RollupStmt,
    SampleStmt, ShardsStmt, SimilarStmt, SplitStmt,
    TopcountStmt, VIndexStmt,
    PatternNode, Pred, ProfileStmt, QueryStmt, RemoveEdgeStmt,
    RemoveVertexStmt, ShowGraphStmt, UpsetEdgeStmt, UpsetPropertyStmt,
    UpsetVertexStmt, UseGraphStmt, WalkPattern, Wildcard,
)

_ARROWS = {L.ARROW_R: "->", L.ARROW_L: "<-", L.DASH2: "--"}


class _ArrowElem:
    """Array element ``--`` / ``--: value`` inside edge declarations."""

    __slots__ = ("direction", "value")

    def __init__(self, direction: str, value: Any = None):
        self.direction = direction
        self.value = value


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = L.tokenize(text)
        self.i = 0

    # ------------------------------------------------------------- helpers
    def peek(self, k: int = 0) -> L.Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> L.Token:
        t = self.toks[self.i]
        if t.kind != L.EOF:
            self.i += 1
        return t

    def expect(self, kind: str) -> L.Token:
        t = self.next()
        if t.kind != kind:
            raise GQLParseError(f"expected {kind}, got {t.kind} ({t.value!r}) at offset {t.pos}")
        return t

    def accept(self, kind: str) -> L.Token | None:
        if self.peek().kind == kind:
            return self.next()
        return None

    # --------------------------------------------------------------- entry
    def parse_script(self) -> list[Any]:
        stmts = []
        while self.peek().kind != L.EOF:
            stmts.append(self.parse_statement())
            while self.accept(L.SEMI):
                pass
        return stmts

    def parse_statement(self) -> Any:
        t = self.peek()
        if t.kind == L.IDENT:
            word = t.value
            if word == "ast":
                self.next()
                return AstStmt(self.parse_statement())
            if word == "profile":
                self.next()
                return ProfileStmt(self.parse_statement())
            if word == "show":
                self.next()
                self.expect(L.IDENT)  # 'graph'
                name = None
                if self.peek().kind == L.STRING:
                    name = self.next().value
                return ShowGraphStmt(name)
            if word == "import":
                self.next()
                return ImportStmt(self.expect(L.STRING).value)
            if word == "use":
                # README §5 Utility: use graph 'xxx' (declared there,
                # absent from the reference grammar)
                self.next()
                self.expect(L.IDENT)  # 'graph'
                return UseGraphStmt(self.expect(L.STRING).value)
            raise GQLParseError(f"unknown command {word!r} at offset {t.pos}")
        obj = self.parse_object()
        return self._build_statement(obj)

    # --------------------------------------------------------------- values
    def parse_value(self) -> Any:
        t = self.peek()
        if t.kind == L.LBRACE:
            return self.parse_object()
        if t.kind == L.LBRACKET:
            return self.parse_array()
        if t.kind == L.STRING:
            return self.next().value
        if t.kind == L.INT or t.kind == L.FLOAT:
            return self.next().value
        if t.kind == L.DATETIME:
            return DatetimeLit(self.next().value)
        if t.kind == L.BINARY:
            return BinaryLit(self.next().value)
        if t.kind == L.GEOHASH:
            return GeohashLit(self.next().value)
        if t.kind == L.STAR:
            self.next()
            return STAR
        if t.kind == L.LPAREN:
            return self.parse_lambda()
        if t.kind == L.IDENT:
            # call expr / member ref / bare ident
            if self.peek(1).kind == L.LPAREN:
                return self.parse_call()
            if self.peek(1).kind == L.DOT and self.peek(2).kind == L.IDENT:
                g = self.next().value
                self.next()
                return MemberRef(g, self.next().value)
            return self.next().value  # bare identifier treated as string
        raise GQLParseError(f"unexpected token {t.kind} ({t.value!r}) at offset {t.pos}")

    def parse_object(self) -> dict:
        self.expect(L.LBRACE)
        out: dict = {}
        while not self.accept(L.RBRACE):
            key = self._parse_key()
            self.expect(L.COLON)
            out[key] = self.parse_value()
            if not self.accept(L.COMMA) and self.peek().kind != L.RBRACE:
                raise GQLParseError(f"expected ',' or '}}' at offset {self.peek().pos}")
        return out

    def _parse_key(self) -> str:
        t = self.next()
        if t.kind in (L.IDENT, L.STRING):
            return t.value
        if t.kind in _ARROWS:
            return _ARROWS[t.kind]
        # `inf` lexes as the infinity FLOAT literal (reference gql.l:159-164)
        # but is a perfectly good property name in key position
        if t.kind == L.FLOAT and t.value == float("inf"):
            return "inf"
        raise GQLParseError(f"bad object key {t.kind} at offset {t.pos}")

    def parse_array(self) -> list:
        self.expect(L.LBRACKET)
        out: list = []
        while not self.accept(L.RBRACKET):
            t = self.peek()
            if t.kind == L.COMMA:  # empty slot: ['tag','relation',,'movie']
                self.next()
                continue
            if t.kind in _ARROWS:
                self.next()
                if self.accept(L.COLON):
                    out.append(_ArrowElem(_ARROWS[t.kind], self.parse_value()))
                else:
                    out.append(_ArrowElem(_ARROWS[t.kind]))
            else:
                out.append(self.parse_value())
            if not self.accept(L.COMMA) and self.peek().kind != L.RBRACKET:
                raise GQLParseError(f"expected ',' or ']' at offset {self.peek().pos}")
        return out

    def parse_call(self) -> CallExpr:
        name = self.expect(L.IDENT).value
        self.expect(L.LPAREN)
        args: list = []
        while not self.accept(L.RPAREN):
            args.append(self.parse_value())
            self.accept(L.COMMA)
        return CallExpr(name, tuple(args))

    # --------------------------------------------------------------- lambda
    def parse_lambda(self) -> Lambda:
        start = self.peek().pos
        self.expect(L.LPAREN)
        params: list[str] = []
        while not self.accept(L.RPAREN):
            params.append(self.expect(L.IDENT).value)
            self.accept(L.COMMA)
        self.expect(L.FATARROW)
        self.expect(L.LBRACE)
        body = self._parse_lambda_body()
        end = self.peek().pos
        return Lambda(tuple(params), tuple(body), self.text[start:end])

    def _parse_lambda_body(self) -> list:
        stmts: list = []
        while not self.accept(L.RBRACE):
            t = self.peek()
            if t.kind == L.SEMI:
                self.next()
                continue
            if t.kind == L.IDENT and t.value == "let":
                self.next()
                name = self.expect(L.IDENT).value
                self._expect_op("=")
                stmts.append(("let", name, self._parse_expr()))
            elif t.kind == L.IDENT and t.value == "return":
                self.next()
                stmts.append(("return", self._parse_expr()))
            elif t.kind == L.IDENT and self.peek(1).kind == L.OP and self.peek(1).value == "=":
                name = self.next().value
                self.next()
                stmts.append(("assign", name, self._parse_expr()))
            else:
                raise GQLParseError(f"bad lambda statement at offset {t.pos}")
        return stmts

    def _expect_op(self, op: str) -> None:
        t = self.next()
        if t.kind != L.OP or t.value != op:
            raise GQLParseError(f"expected {op!r} at offset {t.pos}")

    def _parse_expr(self):
        # additive
        left = self._parse_term()
        while True:
            t = self.peek()
            if t.kind == L.OP and t.value in "+-":
                self.next()
                left = (t.value, left, self._parse_term())
            else:
                return left

    def _parse_term(self):
        left = self._parse_factor()
        while True:
            t = self.peek()
            if (t.kind == L.OP and t.value == "/") or t.kind == L.STAR:
                op = "/" if t.kind == L.OP else "*"
                self.next()
                left = (op, left, self._parse_factor())
            else:
                return left

    def _parse_factor(self):
        t = self.peek()
        if t.kind in (L.INT, L.FLOAT):
            return ("const", self.next().value)
        if t.kind == L.IDENT:
            return ("var", self.next().value)
        if t.kind == L.LPAREN:
            self.next()
            e = self._parse_expr()
            self.expect(L.RPAREN)
            return e
        if t.kind == L.OP and t.value == "-":
            self.next()
            return ("neg", self._parse_factor())
        raise GQLParseError(f"bad lambda factor at offset {t.pos}")

    # --------------------------------------------------- statement building
    def _build_statement(self, obj: dict) -> Any:
        if "create" in obj:
            return CreateStmt(obj["create"], self._build_groups(obj.get("group", [])))
        if "upset" in obj:
            group = obj["upset"]
            if "vertex" in obj:
                return UpsetVertexStmt(group, self._build_vertices(obj["vertex"]))
            if "edge" in obj:
                return UpsetEdgeStmt(group, self._build_edges(obj["edge"]))
            if "property" in obj:
                return UpsetPropertyStmt(group, obj["property"],
                                         self._build_where(obj.get("where")))
            raise GQLParseError("upset requires vertex/edge/property")
        if "query" in obj and "event" in obj:
            # inference form (README.md:252-268): where holds weighted
            # edge triples, not a walk pattern — keep them raw
            events = obj["event"]
            if not isinstance(events, list):
                events = [events]
            where = obj.get("where") or []
            if not isinstance(where, list):
                raise GQLParseError("infer: where must be an edge list")
            return InferStmt(obj["query"], events, where)
        if "query" in obj:
            return QueryStmt(obj["query"], obj.get("in"),
                             self._build_where(obj.get("where")),
                             obj.get("from"))
        if "remove" in obj:
            group = obj["remove"]
            if "vertex" in obj:
                return RemoveVertexStmt(group, self._build_where(obj["vertex"]))
            if "edge" in obj:
                where = self._build_where(obj["edge"])
                if not isinstance(where, WalkPattern):
                    raise GQLParseError("remove edge requires a pattern")
                return RemoveEdgeStmt(group, where)
            raise GQLParseError("remove requires vertex/edge")
        if "drop" in obj:
            return DropStmt(obj["drop"])
        if "dump" in obj:
            return DumpStmt(obj["dump"])
        if "dedup" in obj:
            thr = obj.get("threshold", 0.8)
            if not isinstance(thr, (int, float)) or isinstance(thr, bool):
                raise GQLParseError("dedup: threshold must be a number")
            best_by = obj.get("best_by")
            if best_by is not None:
                if not isinstance(best_by, str) or not best_by:
                    raise GQLParseError(
                        "dedup: best_by must be a property name")
                if str(obj.get("method", "exact")) != "clusters":
                    raise GQLParseError(
                        "dedup: best_by requires method: 'clusters' "
                        "(survivor selection happens per cluster)")
            return DedupStmt(obj["dedup"], obj.get("in"),
                             str(obj.get("method", "exact")),
                             obj.get("on"), float(thr), best_by)
        if "curate" in obj:
            bench = obj.get("benchmark")
            if not isinstance(bench, str) or not bench:
                raise GQLParseError(
                    "curate: benchmark must be a group name")
            qmin = obj.get("quality_min", 0.5)
            if (not isinstance(qmin, (int, float))
                    or isinstance(qmin, bool)
                    or not 0.0 <= float(qmin) <= 1.0):
                raise GQLParseError(
                    "curate: quality_min must be a number in [0, 1]")
            ngram = obj.get("ngram", 8)
            if (not isinstance(ngram, int) or isinstance(ngram, bool)
                    or ngram < 1):
                raise GQLParseError(
                    "curate: ngram must be a positive integer")
            method = str(obj.get("method", "exact"))
            if method not in ("exact", "clusters"):
                raise GQLParseError(
                    "curate: method must be 'exact' or 'clusters'")
            best_by = obj.get("best_by")
            if best_by is not None and (not isinstance(best_by, str)
                                        or not best_by):
                raise GQLParseError(
                    "curate: best_by must be a property name")
            thr = obj.get("threshold", 0.7)
            if not isinstance(thr, (int, float)) or isinstance(thr, bool):
                raise GQLParseError("curate: threshold must be a number")
            if "threshold" in obj and method != "clusters":
                raise GQLParseError(
                    "curate: threshold applies to method: 'clusters' "
                    "(the near-dup Jaccard cut) only")
            extra = sorted(set(obj) - {"curate", "benchmark", "in",
                                       "on", "quality_min", "ngram",
                                       "method", "best_by",
                                       "threshold"})
            if extra:
                raise GQLParseError(
                    f"curate: unknown key(s) {', '.join(extra)}")
            return CurateStmt(obj["curate"], bench, obj.get("in"),
                              str(obj.get("on", "text")), float(qmin),
                              ngram, method, best_by, float(thr))
        if "similar" in obj:
            vec = obj.get("to")
            qgrp = obj.get("queries")
            if qgrp is not None:
                if not isinstance(qgrp, str) or not qgrp:
                    raise GQLParseError("similar: queries must be a "
                                        "group name")
                if vec is not None:
                    raise GQLParseError("similar: to and queries are "
                                        "mutually exclusive")
            elif (not isinstance(vec, list) or not vec
                    or not all(isinstance(x, (int, float))
                               and not isinstance(x, bool) for x in vec)):
                raise GQLParseError("similar: to must be a numeric vector")
            top = obj.get("top", 10)
            if not isinstance(top, int) or isinstance(top, bool) or top < 1:
                raise GQLParseError("similar: top must be a positive integer")
            idx = obj.get("index")
            if idx is not None and (not isinstance(idx, str) or not idx):
                raise GQLParseError("similar: index must be a path string")
            nlist, nprobe = obj.get("nlist"), obj.get("nprobe")
            for nm, v in (("nlist", nlist), ("nprobe", nprobe)):
                if v is None:
                    continue
                if qgrp is None:
                    raise GQLParseError(f"similar: {nm} applies to the "
                                        "join form (queries:) only")
                if not isinstance(v, int) or isinstance(v, bool) or v < 1:
                    raise GQLParseError(f"similar: {nm} must be a "
                                        "positive integer")
            qon = obj.get("qon")
            if qon is not None and qgrp is None:
                raise GQLParseError("similar: qon applies to the join "
                                    "form (queries:) only")
            return SimilarStmt(obj["similar"],
                               None if vec is None
                               else [float(x) for x in vec],
                               obj.get("in"), top,
                               str(obj.get("on", "embedding")),
                               str(obj.get("method", "brute")), idx,
                               qgrp, None if qon is None else str(qon),
                               nlist, nprobe)
        if "chunk" in obj:
            size = obj.get("size", 64)
            overlap = obj.get("overlap", 8)
            for nm, v in (("size", size), ("overlap", overlap)):
                if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                    raise GQLParseError(
                        f"chunk: {nm} must be a non-negative integer")
            if size < 1:
                raise GQLParseError("chunk: size must be >= 1")
            if overlap >= size:
                raise GQLParseError("chunk: overlap must be < size")
            return ChunkStmt(obj["chunk"], obj.get("in"),
                             str(obj.get("on", "text")), size, overlap)
        if "funnel" in obj:
            steps = obj.get("steps")
            if (not isinstance(steps, list) or not steps
                    or not all(isinstance(s, str) for s in steps)):
                raise GQLParseError(
                    "funnel: steps must be a non-empty string list")
            within = obj.get("within")
            if within is not None and (not isinstance(within, int)
                                       or isinstance(within, bool)
                                       or within < 0):
                raise GQLParseError(
                    "funnel: within must be a non-negative integer")
            return FunnelStmt(obj["funnel"], steps, obj.get("in"),
                              str(obj.get("by", "user_id")),
                              str(obj.get("on", "event_type")),
                              str(obj.get("ts", "ts")), within)
        if "cohort" in obj:
            bucket = obj.get("bucket", 86400)
            if not isinstance(bucket, int) or isinstance(bucket, bool) \
                    or bucket < 1:
                raise GQLParseError(
                    "cohort: bucket must be a positive integer (seconds)")
            return CohortStmt(obj["cohort"], obj.get("in"),
                              str(obj.get("by", "user_id")),
                              str(obj.get("ts", "ts")), bucket)
        if "sample" in obj:
            rate, rates = obj.get("rate"), obj.get("rates")
            clusters = obj.get("clusters")
            if clusters is not None:
                if rate is not None or rates is not None:
                    raise GQLParseError(
                        "sample: clusters is exclusive with rate / rates")
                per = obj.get("per", 1)
                for nm, v in (("clusters", clusters), ("per", per)):
                    if not isinstance(v, int) or isinstance(v, bool) \
                            or v < 1:
                        raise GQLParseError(
                            f"sample: {nm} must be a positive integer")
                return SampleStmt(obj["sample"], obj.get("in"),
                                  salt=str(obj.get("salt", "")),
                                  clusters=int(clusters), per=int(per),
                                  on=str(obj.get("on", "embedding")))
            if (rate is None) == (rates is None):
                raise GQLParseError(
                    "sample: exactly one of rate / rates is required")
            if rate is not None:
                if not isinstance(rate, (int, float)) \
                        or isinstance(rate, bool) or not 0 <= rate <= 1:
                    raise GQLParseError("sample: rate must be in [0, 1]")
            else:
                if not isinstance(rates, dict) or not rates \
                        or "by" not in obj:
                    raise GQLParseError(
                        "sample: rates requires a dict and a by: property")
                for v in rates.values():
                    if not isinstance(v, (int, float)) \
                            or isinstance(v, bool) or not 0 <= v <= 1:
                        raise GQLParseError(
                            "sample: every rates value must be in [0, 1]")
            dflt = obj.get("default", 0.0)
            if not isinstance(dflt, (int, float)) or isinstance(dflt, bool) \
                    or not 0 <= dflt <= 1:
                raise GQLParseError("sample: default must be in [0, 1]")
            return SampleStmt(obj["sample"], obj.get("in"),
                              None if rate is None else float(rate),
                              obj.get("by"),
                              None if rates is None else
                              {str(k): float(v) for k, v in rates.items()},
                              float(dflt), str(obj.get("salt", "")))
        if "vindex" in obj:
            path = obj.get("path")
            if not isinstance(path, str) or not path:
                raise GQLParseError("vindex: a path: string is required")
            nlist = obj.get("nlist")
            if nlist is not None and (not isinstance(nlist, int)
                                      or isinstance(nlist, bool)
                                      or nlist < 1):
                raise GQLParseError("vindex: nlist must be a positive "
                                    "integer")
            refine = obj.get("refine", 0)
            if not isinstance(refine, int) or isinstance(refine, bool) \
                    or refine < 0:
                raise GQLParseError("vindex: refine must be a non-negative "
                                    "integer")
            compact = obj.get("compact", False)
            if not isinstance(compact, bool):
                if not (isinstance(compact, str) and compact.lower()
                        in ("true", "false", "0", "1", "no", "yes")):
                    raise GQLParseError(
                        "vindex: compact must be true or false")
                compact = self._flag(compact)
            if compact and (nlist is not None or refine):
                raise GQLParseError("vindex: compact folds the overlay "
                                    "into the existing index — nlist/"
                                    "refine do not apply")
            pq = obj.get("pq", False)
            if not isinstance(pq, bool):
                pq = self._flag(str(pq))
            if compact and ("m" in obj or "ksub" in obj):
                raise GQLParseError(
                    "vindex: compact folds the overlay into the "
                    "existing index — m/ksub come from its sidecar")
            m = obj.get("m", 8)
            ksub = obj.get("ksub", 64)
            for k, v in (("m", m), ("ksub", ksub)):
                if not isinstance(v, int) or isinstance(v, bool) or v < 1:
                    raise GQLParseError(
                        f"vindex: {k} must be a positive integer")
            if not pq and ("m" in obj or "ksub" in obj):
                raise GQLParseError(
                    "vindex: m/ksub size the product quantizer — add "
                    "pq: true (the full-vector index has no codes)")
            attach = obj.get("attach", False)
            if not isinstance(attach, bool):
                attach = self._flag(str(attach))
            if attach and (compact or nlist is not None or refine
                           or "m" in obj or "ksub" in obj or "pq" in obj):
                raise GQLParseError(
                    "vindex: attach re-wires an EXISTING index at path "
                    "— the kind and parameters come from its sidecar "
                    "(drop nlist/refine/pq/m/ksub/compact)")
            return VIndexStmt(obj["vindex"], path, obj.get("in"),
                              str(obj.get("on", "embedding")), nlist,
                              refine, compact, pq, m, ksub, attach)
        if "layout" in obj:
            path = obj.get("path")
            if not isinstance(path, str) or not path:
                raise GQLParseError("layout: a path: string is required")
            by = obj.get("by")
            bucket_by = obj.get("bucket_by")
            attach = obj.get("attach", False)
            if not isinstance(attach, bool):
                attach = self._flag(str(attach))
            compact = obj.get("compact", False)
            if not isinstance(compact, bool):
                compact = self._flag(str(compact))
            if compact and (by is not None or bucket_by is not None
                            or attach or "files" in obj
                            or "buckets" in obj):
                raise GQLParseError(
                    "layout: compact folds the overlay into the "
                    "ALREADY-attached layout — drop "
                    "by/bucket_by/files/buckets/attach")
            if by is not None and bucket_by is not None:
                raise GQLParseError(
                    "layout: give at most one of by: (sort/z-order "
                    "columns) and bucket_by: (hash-bucket key)")
            if by is None and bucket_by is None and not attach \
                    and not compact:
                raise GQLParseError(
                    "layout: exactly one of by: (sort/z-order columns) "
                    "or bucket_by: (hash-bucket key) is required "
                    "(or attach: true / compact: true for an existing "
                    "layout)")
            if by is not None:
                if isinstance(by, str):
                    by = [by]
                if (not isinstance(by, list) or not by
                        or not all(isinstance(c, str) and c for c in by)):
                    raise GQLParseError(
                        "layout: by must be a property name or a "
                        "non-empty list of property names")
            if bucket_by is not None and (
                    not isinstance(bucket_by, str) or not bucket_by):
                raise GQLParseError(
                    "layout: bucket_by must be a property name")
            files = obj.get("files", 16)
            buckets = obj.get("buckets", 16)
            for k, v in (("files", files), ("buckets", buckets)):
                if not isinstance(v, int) or isinstance(v, bool) or v < 1:
                    raise GQLParseError(
                        f"layout: {k} must be a positive integer")
            return LayoutStmt(obj["layout"], path, obj.get("in"),
                              by, files, bucket_by, buckets, attach,
                              compact)
        if "topcount" in obj:
            path = obj["topcount"]
            if not isinstance(path, str) or not path:
                raise GQLParseError(
                    "topcount: the value must be the rollup path "
                    "({topcount: '<path>', on: 'col', keys: [...]})")
            on = obj.get("on")
            if not isinstance(on, str) or not on:
                raise GQLParseError(
                    "topcount: on: (the cms metric's property name) "
                    "is required")
            keys = obj.get("keys")
            if (not isinstance(keys, list) or not keys
                    or not all(isinstance(k, (str, int, float))
                               and not isinstance(k, bool)
                               for k in keys)):
                raise GQLParseError(
                    "topcount: keys must be a non-empty list of "
                    "literal keys to estimate")
            extra = sorted(set(obj) - {"topcount", "on", "keys"})
            if extra:
                raise GQLParseError(
                    f"topcount: unknown key(s) {', '.join(extra)}")
            return TopcountStmt(path, on, list(keys))
        if "quantiles" in obj:
            path = obj["quantiles"]
            if not isinstance(path, str) or not path:
                raise GQLParseError(
                    "quantiles: the value must be the rollup path "
                    "({quantiles: '<path>', on: 'col', qs: [...]})")
            on = obj.get("on")
            if not isinstance(on, str) or not on:
                raise GQLParseError(
                    "quantiles: on: (the hist metric's property name) "
                    "is required")
            qs = obj.get("qs")

            def _frac(x):
                return (isinstance(x, (int, float))
                        and not isinstance(x, bool) and 0 <= x <= 1)
            if (not isinstance(qs, list) or not qs
                    or not all(_frac(x) for x in qs)):
                raise GQLParseError(
                    "quantiles: qs must be a non-empty list of "
                    "numbers in [0, 1]")
            extra = sorted(set(obj) - {"quantiles", "on", "qs"})
            if extra:
                raise GQLParseError(
                    f"quantiles: unknown key(s) {', '.join(extra)}")
            return QuantilesStmt(path, on, [float(x) for x in qs])
        if "rollup" in obj:
            read = obj.get("read", False)
            if not isinstance(read, bool):
                read = self._flag(str(read))
            if read:
                path = obj["rollup"]
                if not isinstance(path, str) or not path:
                    raise GQLParseError(
                        "rollup read: the statement value must be the "
                        "rollup path ({rollup: '<path>', read: true})")
                avg = obj.get("avg")
                if avg is not None:
                    if isinstance(avg, str):
                        avg = [avg]
                    if (not isinstance(avg, list) or not avg
                            or not all(isinstance(c, str) and c
                                       for c in avg)):
                        raise GQLParseError(
                            "rollup read: avg must be a property name "
                            "or a non-empty list of property names")
                extra = sorted(set(obj) - {"rollup", "read", "avg"})
                if extra:
                    raise GQLParseError(
                        f"rollup read: unknown key(s) "
                        f"{', '.join(extra)} (buckets and metrics come "
                        "from the rollup's own spec sidecar)")
                return ReadRollupStmt(path, avg)
            path = obj.get("path")
            if not isinstance(path, str) or not path:
                raise GQLParseError("rollup: a path: string is required")
            append = obj.get("append", False)
            if not isinstance(append, bool):
                append = self._flag(str(append))
            if append:
                extra = sorted(set(obj)
                               & {"ts", "every", "by", "metrics",
                                  "hist", "cms"})
                if extra:
                    raise GQLParseError(
                        f"rollup append: {', '.join(extra)} come from the "
                        "rollup's own spec sidecar — drop them")
                return RollupStmt(obj["rollup"], path, obj.get("in"),
                                  append=True)
            every = obj.get("every", 3600)
            if not isinstance(every, int) or isinstance(every, bool) \
                    or every < 1:
                raise GQLParseError(
                    "rollup: every must be a positive integer (seconds)")
            by = obj.get("by")
            if by is not None:
                if isinstance(by, str):
                    by = [by]
                if (not isinstance(by, list) or not by
                        or not all(isinstance(c, str) and c for c in by)):
                    raise GQLParseError(
                        "rollup: by must be a property name or a "
                        "non-empty list of property names")
            metrics = obj.get("metrics")
            if metrics is not None:
                if (not isinstance(metrics, dict)
                        or not all(isinstance(k, str) and isinstance(v, list)
                                   and all(isinstance(f, str) for f in v)
                                   for k, v in metrics.items())):
                    raise GQLParseError(
                        "rollup: metrics must map property names to "
                        "lists of aggregate names (sum/min/max/kmv)")
            ts = obj.get("ts", "ts")
            if not isinstance(ts, str) or not ts:
                raise GQLParseError("rollup: ts must be a property name")
            hist = obj.get("hist")
            if hist is not None:
                def _num(x):
                    return (isinstance(x, (int, float))
                            and not isinstance(x, bool))
                def _bins(x):
                    # bool is an int subclass: hist: {v: [0, 10, true]}
                    # must not silently become a 1-bin histogram
                    return (isinstance(x, int)
                            and not isinstance(x, bool) and x >= 1)
                if (not isinstance(hist, dict)
                        or not all(isinstance(c, str) and isinstance(v, list)
                                   and len(v) == 3 and _num(v[0])
                                   and _num(v[1]) and _bins(v[2])
                                   and v[0] < v[1]
                                   for c, v in hist.items())):
                    raise GQLParseError(
                        "rollup: hist must map property names to "
                        "[lo, hi, bins] (numeric lo < hi, bins a "
                        "positive integer)")
            cms = obj.get("cms")
            if cms is not None:
                def _posint(x):
                    return (isinstance(x, int)
                            and not isinstance(x, bool) and x >= 1)
                if (not isinstance(cms, dict)
                        or not all(isinstance(c, str) and isinstance(v, list)
                                   and len(v) == 2 and _posint(v[0])
                                   and _posint(v[1])
                                   for c, v in cms.items())):
                    raise GQLParseError(
                        "rollup: cms must map property names to "
                        "[d, w] (positive integers — count-min rows "
                        "and width)")
            return RollupStmt(obj["rollup"], path, obj.get("in"),
                              ts, every, by, metrics, False, hist, cms)
        if "shards" in obj:
            path = obj.get("path")
            if not isinstance(path, str) or not path:
                raise GQLParseError("shards: a path: string is required")
            nsh = obj.get("n", 32)
            if not isinstance(nsh, int) or isinstance(nsh, bool) or nsh < 1:
                raise GQLParseError("shards: n must be a positive integer")
            return ShardsStmt(obj["shards"], path, obj.get("in"),
                              nsh, str(obj.get("salt", "")))
        if "split" in obj:
            weights = obj.get("weights")
            if weights is not None:
                if (not isinstance(weights, dict) or not weights
                        or not all(isinstance(v, (int, float))
                                   and not isinstance(v, bool)
                                   and 0 <= v <= 1
                                   for v in weights.values())):
                    raise GQLParseError(
                        "split: weights must be a dict of fractions "
                        "in [0, 1]")
                if abs(sum(weights.values()) - 1.0) > 1e-9:
                    raise GQLParseError("split: weights must sum to 1")
            by = obj.get("by")
            if by is not None and (not isinstance(by, str) or not by):
                raise GQLParseError("split: by must be a property name")
            extra = sorted(set(obj) - {"split", "in", "weights", "by",
                                       "salt"})
            if extra:
                raise GQLParseError(
                    f"split: unknown key(s) {', '.join(extra)}")
            return SplitStmt(obj["split"], obj.get("in"),
                             None if weights is None else
                             {str(k): float(v)
                              for k, v in weights.items()},
                             by, str(obj.get("salt", "")))
        if "budget" in obj:
            tokens = obj.get("tokens")
            if not isinstance(tokens, int) or isinstance(tokens, bool) \
                    or tokens < 0:
                raise GQLParseError(
                    "budget: tokens must be a non-negative integer")
            for nm in ("by", "on"):
                v = obj.get(nm)
                if v is not None and (not isinstance(v, str) or not v):
                    raise GQLParseError(
                        f"budget: {nm} must be a property name")
            extra = sorted(set(obj) - {"budget", "in", "tokens", "by",
                                       "on"})
            if extra:
                raise GQLParseError(
                    f"budget: unknown key(s) {', '.join(extra)}")
            return BudgetStmt(obj["budget"], int(tokens), obj.get("in"),
                              str(obj.get("by", "quality")),
                              str(obj.get("on", "n_tokens")))
        if "retrieve" in obj:
            terms = obj.get("terms")
            if (not isinstance(terms, list) or not terms
                    or not all(isinstance(t, str) and t for t in terms)):
                raise GQLParseError(
                    "retrieve: terms must be a non-empty string list")
            top = obj.get("top", 20)
            if not isinstance(top, int) or isinstance(top, bool) \
                    or top < 1:
                raise GQLParseError(
                    "retrieve: top must be a positive integer")
            k1 = obj.get("k1", 1.2)
            if (not isinstance(k1, (int, float)) or isinstance(k1, bool)
                    or k1 <= 0):
                raise GQLParseError(
                    "retrieve: k1 must be a positive number")
            bb = obj.get("b", 0.75)
            if (not isinstance(bb, (int, float)) or isinstance(bb, bool)
                    or not 0 <= bb <= 1):
                raise GQLParseError("retrieve: b must be in [0, 1]")
            near, vectors = obj.get("near"), obj.get("vectors")
            if (near is None) != (vectors is None):
                raise GQLParseError(
                    "retrieve: near and vectors come together "
                    "(hybrid needs both the query vector and the "
                    "embedding group)")
            if near is not None:
                if (not isinstance(near, list) or not near
                        or not all(isinstance(x, (int, float))
                                   and not isinstance(x, bool)
                                   for x in near)):
                    raise GQLParseError(
                        "retrieve: near must be a numeric vector")
                if not isinstance(vectors, str) or not vectors:
                    raise GQLParseError(
                        "retrieve: vectors must be a group name")
            fuse = obj.get("fuse", 60)
            if not isinstance(fuse, int) or isinstance(fuse, bool) \
                    or fuse < 1:
                raise GQLParseError(
                    "retrieve: fuse must be a positive integer")
            if "fuse" in obj and near is None:
                raise GQLParseError(
                    "retrieve: fuse applies to the hybrid form "
                    "(near/vectors) only")
            extra = sorted(set(obj) - {"retrieve", "in", "terms", "top",
                                       "on", "k1", "b", "near",
                                       "vectors", "von", "fuse"})
            if extra:
                raise GQLParseError(
                    f"retrieve: unknown key(s) {', '.join(extra)}")
            return RetrieveStmt(obj["retrieve"], [str(t) for t in terms],
                                obj.get("in"), int(top),
                                str(obj.get("on", "text")), float(k1),
                                float(bb),
                                None if near is None else
                                [float(x) for x in near],
                                vectors, str(obj.get("von", "embedding")),
                                int(fuse))
        raise GQLParseError(f"unrecognized statement keys: {sorted(obj)}")

    def _build_groups(self, raw: list) -> list[GroupDef]:
        groups: list[GroupDef] = []
        for el in raw:
            if isinstance(el, str):
                groups.append(GroupDef(el))
            elif isinstance(el, dict):
                gd = GroupDef("")
                for k, v in el.items():
                    if k == "index":
                        gd.index = v if isinstance(v, list) else [v]
                    else:
                        gd.name = k
                        gd.props = v if isinstance(v, list) else [v]
                groups.append(gd)
            elif isinstance(el, list):
                # edge group: [from, name|{name:props}, to]
                if len(el) < 3:
                    raise GQLParseError(f"bad edge group def: {el!r}")
                src, mid, dst = el[0], el[1:-1], el[-1]
                gd = GroupDef("", is_edge=True, src_group=src, dst_group=dst)
                for m in mid:
                    if isinstance(m, str):
                        gd.name = m
                    elif isinstance(m, dict):
                        for k, v in m.items():
                            gd.name = k
                            gd.props = v if isinstance(v, list) else [v]
                groups.append(gd)
            else:
                raise GQLParseError(f"bad group def: {el!r}")
        return groups

    def _build_vertices(self, raw: Any) -> list[tuple]:
        if not isinstance(raw, list):
            raw = [raw]
        # flat single-vertex form (dump output): vertex: [key, {props}]
        if (len(raw) == 2 and not isinstance(raw[0], (list, dict))
                and isinstance(raw[1], dict)):
            return [(raw[0], raw[1])]
        out = []
        for el in raw:
            if isinstance(el, list):
                key = el[0]
                props = el[1] if len(el) > 1 else None
                out.append((key, props))
            elif isinstance(el, dict):
                raise GQLParseError(f"bad vertex declaration: {el!r}")
            else:
                out.append((el, None))
        return out

    def _build_edges(self, raw: Any) -> list[tuple]:
        if not isinstance(raw, list):
            raise GQLParseError("edge value must be an array")
        decls = raw if raw and isinstance(raw[0], list) else [raw]
        out = []
        for d in decls:
            if len(d) != 3 or not isinstance(d[1], _ArrowElem):
                raise GQLParseError(f"bad edge declaration: {d!r}")
            arrow = d[1]
            props = arrow.value if isinstance(arrow.value, dict) else None
            out.append((d[0], arrow.direction, d[2], props))
        return out

    # ------------------------------------------------------------- where
    def _build_where(self, raw: Any) -> Any:
        if raw is None:
            return None
        if isinstance(raw, list):
            return self._build_pattern(raw)
        if isinstance(raw, dict):
            return self._build_pred_conj(raw)
        # bare key → id equality (walk position, ScanPlan.cpp:575-592)
        return Pred("id", "eq", raw)

    def _build_pred_conj(self, obj: dict) -> Pred:
        preds = [self._build_pred(k, v) for k, v in obj.items()]
        if len(preds) == 1:
            return preds[0]
        return Pred(None, "and", children=preds)

    def _build_pred(self, key: str, val: Any) -> Pred:
        if key == "$and":
            return Pred(None, "and",
                        children=[self._build_where(v) for v in val])
        if key == "$or":
            return Pred(None, "or",
                        children=[self._build_where(v) for v in val])
        if key in ("--", "->", "<-"):
            # k-hop neighbor spec (README.md:244-246)
            return Pred(None, "khop", {"direction": key, "hops": val})
        if val is STAR or isinstance(val, Wildcard):
            return Pred(key, "exists")
        if isinstance(val, dict):
            return self._build_op_pred(key, val)
        if isinstance(val, list):
            return Pred(key, "in", val)
        return Pred(key, "eq", val)

    @staticmethod
    def _flag(v: Any) -> bool:
        """Boolean-ish GQL value: bare identifiers tokenize as strings, so
        ``exact: false`` arrives as the (truthy) string 'false'."""
        if isinstance(v, str):
            return v.lower() not in ("false", "0", "no", "")
        return bool(v)

    def _build_op_pred(self, attr: str, spec: dict) -> Pred:
        ops = {k.lstrip("$"): v for k, v in spec.items()}
        if "near" in ops:
            near = ops["near"]
            if isinstance(near, dict):
                geom = near.get("$geometry") or near.get("geometry")
                radius_op = next((o for o in ("lte", "lt")
                                  if f"${o}" in near or o in near), None)
                radius = near.get(f"${radius_op}", near.get(radius_op)) if radius_op else None
                return Pred(attr, "near", {"geometry": geom, "radius": radius,
                                           "radius_op": radius_op or "lte",
                                           "limit": ops.get("limit"),
                                           "exact": self._flag(ops.get("exact"))})
            return Pred(attr, "near", {"geometry": near, "radius": None,
                                       "radius_op": "lte",
                                       "limit": ops.get("limit"),
                                       "exact": self._flag(ops.get("exact"))})
        children = []
        for op, v in ops.items():
            if op in ("lt", "gt", "lte", "gte", "eq"):
                children.append(Pred(attr, op, v))
            elif op == "limit":
                continue
            else:
                raise GQLParseError(f"unknown operator ${op} on {attr}")
        if len(children) == 1:
            return children[0]
        return Pred(None, "and", children=children)

    def _build_pattern(self, raw: list) -> WalkPattern:
        nodes: list[PatternNode] = []
        conns: list[EdgeConn] = []
        expect_node = True
        for el in raw:
            if isinstance(el, _ArrowElem):
                conn = EdgeConn(el.direction)
                if isinstance(el.value, CallExpr):
                    conn.agg = el.value
                elif isinstance(el.value, str):
                    conn.edge_group = el.value
                elif isinstance(el.value, dict):
                    conn.props = el.value
                conns.append(conn)
                expect_node = True
                continue
            if isinstance(el, dict) and len(el) == 1 and next(iter(el)) in ("--", "->", "<-"):
                d, v = next(iter(el.items()))
                conn = EdgeConn(d)
                if isinstance(v, str):
                    conn.edge_group = v
                elif isinstance(v, dict):
                    conn.props = v
                conns.append(conn)
                expect_node = True
                continue
            if not expect_node:
                raise GQLParseError(f"expected connection in pattern, got {el!r}")
            if el is STAR or isinstance(el, Wildcard):
                nodes.append(PatternNode(wildcard=True))
            elif isinstance(el, dict):
                nodes.append(PatternNode(conds=el))
            else:
                nodes.append(PatternNode(key=el))
            expect_node = False
        if len(nodes) != len(conns) + 1:
            raise GQLParseError(
                f"malformed pattern: {len(nodes)} nodes / {len(conns)} connections")
        return WalkPattern(nodes, conns)


def parse(text: str) -> list[Any]:
    """Parse a GQL script into a list of statement AST nodes."""
    return Parser(text).parse_script()


def parse_one(text: str) -> Any:
    stmts = parse(text)
    if len(stmts) != 1:
        raise GQLParseError(f"expected one statement, got {len(stmts)}")
    return stmts[0]
