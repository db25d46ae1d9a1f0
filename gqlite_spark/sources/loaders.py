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


_DOT_HEADER = re.compile(r'^\s*(?:strict\s+)?(di)?graph\s+(\w+)?\s*\{',
                         re.IGNORECASE)
_DOT_EDGE = re.compile(r'(\w+)\s*(--|->)\s*(\w+)\s*(?:\[([^\]]*)\])?\s*;')
_DOT_ATTR = re.compile(r'(\w+)\s*=\s*"?([^,"\]]+)"?')


def load_dot(db: GQLite, text: str, graph: Optional[str] = None,
             vertex_group: str = "node", edge_group: str = "edge") -> str:
    """Parse a Graphviz DOT graph (the reference's test/graphs/*.dot
    corpus: ``graph G { A -- B [weight = 82]; }``) into a GQLite graph.
    Returns the graph name (DOT header name unless overridden).  Undirected
    ``--`` and directed ``->`` edges keep their orientation; ``[k = v]``
    attribute lists become edge properties."""
    m = _DOT_HEADER.search(text)
    if not m:
        from ..errors import GQLiteError
        raise GQLiteError("import: not a DOT graph file")
    name = graph or m.group(2) or "g"
    g = db.catalog.create_graph(name)
    vg = g.groups.get(vertex_group) or g.create_group(vertex_group)
    eg = g.groups.get(edge_group) or g.create_group(
        edge_group, is_edge=True, src_group=vertex_group,
        dst_group=vertex_group)
    for em in _DOT_EDGE.finditer(text):
        src, op, dst, attrs = em.groups()
        src, dst = _parse_value(src), _parse_value(dst)
        props = {k: _parse_value(v.strip())
                 for k, v in _DOT_ATTR.findall(attrs)} if attrs else None
        if src not in vg.rows:
            vg.upsert_vertex(src, None)
        if dst not in vg.rows:
            vg.upsert_vertex(dst, None)
        eg.upsert_edge(src, op, dst, props)
    return name


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


def load_jsonl_vertices(db: GQLite, graph: str, group: str, path: str,
                        key_col: str, multiline: bool = False) -> DataFrame:
    """Ingest newline-delimited JSON as a vertex group (bulk registration;
    schema inferred by the Spark JSON source, nested fields preserved)."""
    df = db.spark.read.json(path, multiLine=multiline)
    g = db.catalog.graph(graph)
    grp = g.groups.get(group) or g.create_group(group)
    grp.register_df(df, key_col=key_col)
    return df


def load_jsonl_edges(db: GQLite, graph: str, group: str, path: str,
                     src_col: str, dst_col: str,
                     src_group: Optional[str] = None,
                     dst_group: Optional[str] = None) -> DataFrame:
    """Ingest newline-delimited JSON as an edge group."""
    df = db.spark.read.json(path)
    g = db.catalog.graph(graph)
    grp = g.groups.get(group) or g.create_group(
        group, is_edge=True, src_group=src_group, dst_group=dst_group)
    grp.register_df(df, src_col=src_col, dst_col=dst_col)
    return df


def load_graphml(db: GQLite, text: str, graph: Optional[str] = None,
                 vertex_group: str = "node",
                 edge_group: str = "edge") -> str:
    """Parse a GraphML document (the standard XML graph-interchange
    format: <graph> with <node>/<edge> elements, typed <key>/<data>
    attributes) into a GQLite graph — stdlib ``xml.etree`` only.
    Returns the graph name (GraphML graph id unless overridden).

    Sits beside the CSV/DOT/nGQL/JSONL loaders as the fourth interchange
    source; ``edgedefault="undirected"`` maps to ``--`` edges, directed
    to ``->``; ``<data>`` values are coerced through the key's declared
    ``attr.type`` (int/long → int, float/double → float, else string).

    Like the other text loaders this is a driver-side ingest for
    interchange-sized graphs; bulk data goes through
    ``Group.register_df`` / parquet."""
    import xml.etree.ElementTree as ET

    from ..errors import GQLiteError
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise GQLiteError(f"import: not a GraphML document ({e})")
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag[:root.tag.index("}") + 1]
    if root.tag != f"{ns}graphml":
        raise GQLiteError("import: not a GraphML document (no <graphml>)")
    gml = root.find(f"{ns}graph")
    if gml is None:
        raise GQLiteError("import: GraphML document has no <graph>")

    keys: dict[str, tuple[str, str]] = {}    # key id → (attr name, type)
    for k in root.iter(f"{ns}key"):
        keys[k.get("id", "")] = (k.get("attr.name", k.get("id", "")),
                                 k.get("attr.type", "string"))

    def props_of(el) -> "Optional[dict]":
        out = {}
        for d in el.findall(f"{ns}data"):
            name, typ = keys.get(d.get("key", ""),
                                 (d.get("key", ""), "string"))
            v = d.text or ""
            try:
                if typ in ("int", "long", "integer"):
                    v = int(v)
                elif typ in ("float", "double"):
                    v = float(v)
                elif typ in ("boolean", "bool"):
                    v = v.strip().lower() == "true"
            except ValueError:
                # malformed typed <data> stays inside the loader's error
                # contract (GQLiteError, like every other bad-GraphML path)
                raise GQLiteError(
                    f"import: GraphML key {name!r} declares attr.type "
                    f"{typ!r} but value {v!r} does not parse")
            out[name] = v
        return out or None

    name = graph or gml.get("id") or "g"
    g = db.catalog.create_graph(name)
    vg = g.groups.get(vertex_group) or g.create_group(vertex_group)
    eg = g.groups.get(edge_group) or g.create_group(
        edge_group, is_edge=True, src_group=vertex_group,
        dst_group=vertex_group)
    default_dir = "->" if gml.get("edgedefault", "directed") == "directed" \
        else "--"
    for nd in gml.findall(f"{ns}node"):
        vg.upsert_vertex(_parse_value(nd.get("id", "")), props_of(nd))
    for ed in gml.findall(f"{ns}edge"):
        src = _parse_value(ed.get("source", ""))
        dst = _parse_value(ed.get("target", ""))
        directed = ed.get("directed")
        op = default_dir if directed is None else \
            ("->" if directed == "true" else "--")
        for key in (src, dst):
            if key not in vg.rows:
                vg.upsert_vertex(key, None)
        eg.upsert_edge(src, op, dst, props_of(ed))
    return name
