"""Parser unit tests (no Spark needed)."""

from gqlite_spark.gql.ast import (CreateStmt, DatetimeLit, Pred, QueryStmt,
                                  RemoveVertexStmt, UpsetEdgeStmt,
                                  UpsetVertexStmt, WalkPattern)
from gqlite_spark.gql.gvm import constant_fold
from gqlite_spark.gql.parser import parse, parse_one


def test_create_groups():
    s = parse_one("{create: 'db', group: [{a: ['x','y'], index: ['x']}, 'b',"
                  " ['a', 'rel', 'b']]};")
    assert isinstance(s, CreateStmt)
    assert s.graph == "db"
    assert [g.name for g in s.groups] == ["a", "b", "rel"]
    assert s.groups[0].props == ["x", "y"]
    assert s.groups[0].index == ["x"]
    assert s.groups[2].is_edge and s.groups[2].src_group == "a"


def test_upset_vertex_forms():
    s = parse_one("{upset: 'g', vertex: [['v1', {a: 1, b: 'x'}], ['v2']]};")
    assert isinstance(s, UpsetVertexStmt)
    assert s.vertices[0][0] == "v1" and s.vertices[0][1] == {"a": 1, "b": "x"}
    assert s.vertices[1] == ("v2", None)
    bare = parse_one("{upset: 'g', vertex: ['3', '4', '5']};")
    assert [v[0] for v in bare.vertices] == ["3", "4", "5"]
    ints = parse_one("{upset: 'g', vertex: [3, 4]};")
    assert [v[0] for v in ints.vertices] == [3, 4]


def test_upset_edge_forms():
    s = parse_one("{upset: 'rel', edge: ['a', --, 5]};")
    assert isinstance(s, UpsetEdgeStmt)
    assert s.edges == [("a", "--", 5, None)]
    s2 = parse_one("{upset: 'rel', edge: [[1, ->: {w: 2}, 7], [2, <-, 9]]};")
    assert s2.edges[0] == (1, "->", 7, {"w": 2})
    assert s2.edges[1] == (2, "<-", 9, None)


def test_tagged_literals():
    s = parse_one("{upset: 'g', vertex: [['v', {t: 0d1653446732,"
                  " b: 0b'AQI=', v: [0, 0.5]}]]};")
    props = s.vertices[0][1]
    assert isinstance(props["t"], DatetimeLit) and props["t"].epoch == 1653446732
    assert props["b"].data == b"\x01\x02"
    assert props["v"] == [0, 0.5]


def test_where_predicates():
    s = parse_one("{query: 'g', in: 'db', where: {a: {$gt: 10}, b: ['x','y'],"
                  " c: *, $or: [{d: 1}, {e: 2}]}};")
    assert isinstance(s, QueryStmt)
    w = s.where
    assert w.op == "and"
    ops = {(p.attr, p.op) for p in w.children}
    assert ("a", "gt") in ops and ("b", "in") in ops and ("c", "exists") in ops


def test_near_and_knn():
    s = parse_one("{query: 'g', where: {loc: {$near: {$geometry: [1.0, 2.0],"
                  " $lte: 0.5}}}};")
    assert s.where.op == "near"
    assert s.where.value["geometry"] == [1.0, 2.0]
    assert s.where.value["radius"] == 0.5
    k = parse_one("{query: 'g', where: {f: {limit: 3, $near: [0.1, 0.2]}}};")
    assert k.where.value["limit"] == 3


def test_edge_pattern_and_path():
    s = parse_one("{query: 'rel', in: 'db', where: ['a', --, *]};")
    assert isinstance(s.where, WalkPattern)
    assert s.where.nodes[1].wildcard
    p = parse_one("{query: 'follow', in: 'db', where: ['x', <-: min('w'), 'y']};")
    conn = p.where.conns[0]
    assert conn.direction == "<-" and conn.agg.func == "min"
    assert conn.agg.args == ("w",)


def test_lambda_fold():
    s = parse_one("{query: 'g', where: {f: {$lte: () => "
                  "{let a = 17; a = (1+2)*2/3-(1.0 + 2)/3.1; return 0.5;}}}};")
    assert s.where.op == "lte"
    assert constant_fold(s.where.value) == 0.5


def test_remove_and_util():
    s = parse_one("{remove: 'g', vertex: {id: '3'}};")
    assert isinstance(s, RemoveVertexStmt)
    assert s.where.attr == "id" and s.where.value == "3"
    assert parse("{drop: 'db'}; {dump: 'db'};")[1].graph == "db"


def test_multi_statement_script():
    stmts = parse("{create: 'a'}; {drop: 'a'};")
    assert len(stmts) == 2
