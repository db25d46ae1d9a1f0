"""Full basketballplayer fixture (FIXTURES.md §3): ingest the reference's
actual nGQL dataset (data/basketballplayer-2.X.ngql) through the nGQL
loader and run the reference's own shortest-path queries
(test/basketballplayer-2.X/query.gql surface)."""

import os

import pytest

NGQL = "/root/reference/data/basketballplayer-2.X.ngql"

pytestmark = pytest.mark.skipif(not os.path.exists(NGQL),
                                reason="reference dataset not present")


@pytest.fixture(scope="module")
def bb(spark):
    from gqlite_spark import GQLite
    from gqlite_spark.sources.loaders import load_ngql_inserts
    db = GQLite(spark)
    db.exec("{create: 'basketballplayer', group: ['player', 'team',"
            " ['player', 'follow', 'player'], ['player', 'serve', 'team']]};")
    load_ngql_inserts(db, "basketballplayer", open(NGQL).read())
    return db


def test_dataset_loaded(bb):
    n_players = bb.exec("{query: count(player), in: 'basketballplayer'};")[0].value
    n_teams = bb.exec("{query: count(team), in: 'basketballplayer'};")[0].value
    assert n_players >= 50 and n_teams >= 29  # ~51 players, ~30 teams


def test_point_lookup_benchmark_workload(bb):
    """The reference's benchmark query (test/benchmark/vertex.gs:1):
    {query: 'player', where: {id: 'player102'}}."""
    rows = bb.exec("{query: 'player', in: 'basketballplayer',"
                   " where: {id: 'player102'}};")[0].rows
    assert len(rows) == 1 and "LaMarcus Aldridge" in rows[0]


def test_shortest_path_reference_query(bb):
    """Reference query.gql:1 — hop-count shortest path player102 ← player113
    (min() with no weight property)."""
    res = bb.exec("{query: 'follow', in: 'basketballplayer',"
                  " where: ['player102', <-: min(), 'player113']};")[0]
    assert res.error is None
    cost, path = res.value
    # player113 follows player100/player125; a path to player102 exists
    assert path[0] == "player113" and path[-1] == "player102"
    assert cost == len(path) - 1 >= 1


def test_weighted_path_with_degree(bb):
    """min('degree')-weighted variant over the follow graph."""
    res = bb.exec("{query: 'follow', in: 'basketballplayer',"
                  " where: ['player113', ->: min('degree'), 'player102']};")[0]
    assert res.error is None and res.value is not None
    cost, path = res.value
    assert path[0] == "player113" and path[-1] == "player102"
    assert cost > 0


def test_follow_pattern_and_khop(bb):
    pat = bb.exec("{query: 'follow', in: 'basketballplayer',"
                  " where: ['player101', ->, *]};")[0]
    followed = {r["dst"] for r in pat.df.collect()}
    assert followed  # Tony Parker follows others
    res = bb.exec("{query: 'player', in: 'basketballplayer',"
                  " from: 'player101', where: {->: 1}};")[0]
    direct = {r["id"] for r in res.df.collect()}
    # 1-hop out-neighbors in the player group = players Parker follows
    # (serve edges lead to teams, which the player-group join filters out)
    assert direct and direct <= followed
