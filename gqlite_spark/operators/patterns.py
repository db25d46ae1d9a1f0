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
    stored undirected edges (which satisfy both orientations).  Plain
    (src, dst) frames without a ``direction`` column are treated as
    directed storage."""
    if "direction" not in edges.columns:
        edges = edges.withColumn("direction", F.lit("->"))
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
    # property-condition nodes join their vertex group — see node_filters
    return None


def match_walk(edges: Optional[DataFrame], pattern: WalkPattern,
               meta: GroupMeta,
               node_filters: "Optional[dict[int, list[DataFrame]]]" = None
               ) -> DataFrame:
    """Return one row per matching path with columns n0..nk.

    ``node_filters`` carries, for every node position with a property-
    condition object, the one-column (``id``) DataFrames of vertices
    satisfying it (one per candidate vertex group; reference surface
    src/gql.y:886-905 ``a_link_condition`` allows conditions at every hop).
    Each becomes a semi-join on the hop column — the same shape as the
    1-hop endpoint-condition path, left to AQE to broadcast when small."""
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
    def _family(dtype: str) -> str:
        return ("integer" if dtype in ("tinyint", "smallint", "int", "bigint")
                else dtype)

    for i, frames in (node_filters or {}).items():
        col_t = dict(cur.dtypes)[f"n{i}"]
        matching = [f.select(F.col("id").cast(col_t).alias("id"))
                    for f in frames
                    if _family(dict(f.dtypes)["id"]) == _family(col_t)]
        if not matching:
            # condition references a group whose key type cannot appear in
            # this hop column — no vertex can satisfy it
            cur = cur.filter(F.lit(False))
            continue
        ids = functools.reduce(lambda a, b: a.unionByName(b), matching)
        cur = cur.join(ids.withColumnRenamed("id", f"n{i}"),
                       f"n{i}", "left_semi")
    # simple-path discipline: no immediate backtracking a→b→a
    for i in range(hops - 1):
        cur = cur.filter(F.col(f"n{i}") != F.col(f"n{i+2}"))
    cols = [f"n{i}" for i in range(hops + 1)]
    return cur.select(*cols).distinct().orderBy(*cols)


def match_motif(edges: Optional[DataFrame],
                pattern_edges: list[tuple[str, str, str]],
                node_filters: "Optional[dict[str, DataFrame]]" = None,
                distinct_nodes: bool = True) -> DataFrame:
    """Branching subgraph/motif match — beyond chain walks (reference
    intent: src/operand/MatchPattern.cpp + CTreeStrategy.cpp, both stubs).

    ``pattern_edges``: [(u, direction, v), ...] with free variable names,
    e.g. a fork ``[('a','->','b'), ('a','->','c')]`` or a triangle
    ``[('a','->','b'), ('b','->','c'), ('a','->','c')]``.  One oriented
    edge relation per pattern edge, joined on shared variables in the
    given order — list selective pattern edges first; every join is keyed
    on the shared variable (disconnected motif components fall back to a
    cross join, which is the correct semantics but worth avoiding).

    ``node_filters``: variable → one-column ``id`` DataFrame; semi-joins
    restrict that variable's binding (property conditions on motif nodes).
    ``distinct_nodes``: all variables bind pairwise-distinct vertices
    (subgraph isomorphism rather than homomorphism).

    Returns one row per match with a column per variable (sorted order).
    """
    if edges is None:
        raise GQLiteError("empty edge group in motif pattern")
    cur: Optional[DataFrame] = None
    bound: list[str] = []
    for u, direction, v in pattern_edges:
        e = _oriented(edges, direction).select(
            F.col("u").alias(u), F.col("v").alias(v))
        if cur is None:
            cur, bound = e, [u, v]
        else:
            on = [x for x in (u, v) if x in bound]
            cur = cur.join(e, on) if on else cur.crossJoin(e)
            bound += [x for x in (u, v) if x not in bound]
    for var, ids in (node_filters or {}).items():
        cur = cur.join(ids.withColumnRenamed("id", var), var, "left_semi")
    if distinct_nodes:
        for i in range(len(bound)):
            for j in range(i + 1, len(bound)):
                cur = cur.filter(F.col(bound[i]) != F.col(bound[j]))
    cols = sorted(bound)
    return cur.select(*cols).distinct().orderBy(*cols)
