"""Bulk ingestion loaders — the Spark-native replacement for the
reference's row-at-a-time ingestion paths:

- CSV (test/movielens.cpp:8-120 ingests MovieLens by per-row upsert through
  the C API — here one spark.read.csv per table, registered zero-copy);
- the offline nGQL/DOT converters (tool/converter/ngql.cpp, tool/l2lite.cpp)
  map to ``load_ngql_inserts`` which parses INSERT VERTEX/EDGE statements;
- ``import <path>`` GQL statement (stub in the reference, gql.y:225-229).

At 100 TB: csv→parquet conversion is a one-time narrow job; after that
every query path reads columnar parquet with pushdown.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..executor import GQLite


def load_csv_vertices(db: GQLite, graph: str, group: str, path: str,
                      key_col: str, header: bool = True,
                      infer_schema: bool = True) -> DataFrame:
    """Ingest a CSV as a vertex group (bulk DataFrame registration)."""
    df = db.spark.read.csv(path, header=header, inferSchema=infer_schema)
    g = db.catalog.graph(graph)
    grp = g.groups.get(group) or g.create_group(group)
    grp.register_df(df, key_col=key_col)
    return df


def load_csv_edges(db: GQLite, graph: str, group: str, path: str,
                   src_col: str, dst_col: str,
                   src_group: Optional[str] = None,
                   dst_group: Optional[str] = None,
                   header: bool = True) -> DataFrame:
    """Ingest a CSV as an edge group."""
    df = db.spark.read.csv(path, header=header, inferSchema=True)
    g = db.catalog.graph(graph)
    grp = g.groups.get(group) or g.create_group(
        group, is_edge=True, src_group=src_group, dst_group=dst_group)
    grp.register_df(df, src_col=src_col, dst_col=dst_col)
    return df


_NGQL_VERTEX = re.compile(
    r'INSERT\s+VERTEX\s+(\w+)\s*\(([^)]*)\)\s+VALUES\s+(.*?);',
    re.IGNORECASE | re.DOTALL)
_NGQL_EDGE = re.compile(
    r'INSERT\s+EDGE\s+(\w+)\s*\(([^)]*)\)\s+VALUES\s+(.*?);',
    re.IGNORECASE | re.DOTALL)
_NGQL_ROW = re.compile(r'"?([^"\s:]+)"?\s*(?:->\s*"?([^"\s:]+)"?)?\s*:\s*\(([^)]*)\)')


def _parse_value(tok: str):
    tok = tok.strip()
    if tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1]
    try:
        return int(tok)
    except ValueError:
        try:
            return float(tok)
        except ValueError:
            return tok


def load_ngql_inserts(db: GQLite, graph: str, text: str) -> None:
    """Parse Nebula nGQL INSERT VERTEX/EDGE statements into graph groups
    (offline-converter parity, tool/converter/ngql.cpp — covers the
    basketballplayer fixture format, data/basketballplayer-2.X.ngql)."""
    g = db.catalog.graph(graph)
    for m in _NGQL_VERTEX.finditer(text):
        group, cols, values = m.group(1), m.group(2), m.group(3)
        props = [c.strip() for c in cols.split(",") if c.strip()]
        grp = g.groups.get(group) or g.create_group(group,
                                                    declared_props=props)
        for row in _NGQL_ROW.finditer(values):
            key, _, vals = row.group(1), row.group(2), row.group(3)
            vlist = [_parse_value(v) for v in vals.split(",")] if vals.strip() else []
            grp.upsert_vertex(_parse_value(key),
                              dict(zip(props, vlist)) or None)
    for m in _NGQL_EDGE.finditer(text):
        group, cols, values = m.group(1), m.group(2), m.group(3)
        props = [c.strip() for c in cols.split(",") if c.strip()]
        grp = g.groups.get(group) or g.create_group(group, is_edge=True)
        for row in _NGQL_ROW.finditer(values):
            src, dst, vals = row.group(1), row.group(2), row.group(3)
            if dst is None:
                continue
            vlist = [_parse_value(v) for v in vals.split(",")] if vals.strip() else []
            grp.upsert_edge(_parse_value(src), "->", _parse_value(dst),
                            dict(zip(props, vlist)) or None)
