"""Multi-hop walk patterns → iterated self-joins.

The reference parses walk declarations (src/gql.y:380-433 →
GWalkDeclaration) but execution is a stub (ScanPlan.cpp:225-226, PathPlan
no-op).  We implement the evident semantics: a chain
``[v1, conn, v2, conn, v3, ...]`` matches paths whose i-th step satisfies
conn_i's direction and whose i-th node satisfies node_i's key/conditions.

Plan shape: one join per hop on the shared node column — Catalyst picks
broadcast vs sort-merge per hop; at scale the edge table should be
pre-partitioned (bucketed) on ``src`` so consecutive hops reuse the
exchange.
"""

from __future__ import annotations

import functools
import operator as _op
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import GroupMeta
from ..errors import GQLiteError
from ..gql.ast import PatternNode, WalkPattern
from ..planner import key_literal


def _oriented(edges: DataFrame, direction: str) -> DataFrame:
    """Edges as traversable (u → v) pairs honoring the conn direction and
    stored undirected edges (which satisfy both orientations)."""
    fwd = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                       "direction")
    rev = edges.select(F.col("dst").alias("u"), F.col("src").alias("v"),
                       "direction")
    if direction == "->":
        return fwd.filter(F.col("direction") != "--").unionByName(
            fwd.filter(F.col("direction") == "--")).unionByName(
            rev.filter(F.col("direction") == "--")).drop("direction")
    if direction == "<-":
        return rev.filter(F.col("direction") != "--").unionByName(
            fwd.filter(F.col("direction") == "--")).unionByName(
            rev.filter(F.col("direction") == "--")).drop("direction")
    return fwd.unionByName(rev).drop("direction")


def _node_cond(col: str, node: PatternNode, meta: GroupMeta):
    if node.wildcard or (node.key is None and not node.conds):
        return None
    if node.key is not None:
        return F.col(col) == F.lit(key_literal(meta, node.key))
    # property-condition nodes need the vertex table join — handled by caller
    return None


def match_walk(edges: Optional[DataFrame], pattern: WalkPattern,
               meta: GroupMeta) -> DataFrame:
    """Return one row per matching path with columns n0..nk."""
    if edges is None:
        raise GQLiteError("empty edge group in walk pattern")
    hops = len(pattern.conns)
    cur: Optional[DataFrame] = None
    for i, conn in enumerate(pattern.conns):
        e = _oriented(edges, conn.direction) \
            .select(F.col("u").alias(f"n{i}"), F.col("v").alias(f"n{i+1}"))
        if cur is None:
            cur = e
        else:
            cur = cur.join(e, f"n{i}")
    conds = []
    for i, node in enumerate(pattern.nodes):
        c = _node_cond(f"n{i}", node, meta)
        if c is not None:
            conds.append(c)
    if conds:
        cur = cur.filter(functools.reduce(_op.and_, conds))
    # simple-path discipline: no immediate backtracking a→b→a
    for i in range(hops - 1):
        cur = cur.filter(F.col(f"n{i}") != F.col(f"n{i+2}"))
    cols = [f"n{i}" for i in range(hops + 1)]
    return cur.select(*cols).distinct().orderBy(*cols)
