"""Cross-validation of the distributed graph algorithms against pure-Python
reference implementations on a seeded pseudo-random graph (~60 vertices,
~150 edges — large enough to exercise multi-layer BFS synchronization,
path-count multiplicities and peeling cascades that the 25-node driver
fixtures cannot)."""

import random
from collections import defaultdict, deque

import pytest

N, M, SEED = 60, 150, 20260813


def _edge_list():
    rng = random.Random(SEED)
    edges = set()
    while len(edges) < M:
        a, b = rng.randrange(N), rng.randrange(N)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _adj(edges):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return adj


@pytest.fixture(scope="module")
def graph(spark):
    edges = _edge_list()
    df = spark.createDataFrame(edges, "src long, dst long").cache()
    return df, edges


def _bfs_dist(adj, s):
    dist = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def test_closeness_vs_python(graph):
    from gqlite_spark.operators.graph_algos import closeness_centrality
    df, edges = graph
    adj = _adj(edges)
    got = {r["id"]: (r["reachable"], r["closeness"])
           for r in closeness_centrality(df).collect()}
    for s in adj:
        dist = _bfs_dist(adj, s)
        sd = sum(dist.values())
        want = round((len(dist) - 1) / sd, 4) if sd else 0.0
        assert got[s][0] == len(dist)
        assert abs(got[s][1] - want) < 2e-4, s


def test_betweenness_vs_python_brandes(graph):
    from gqlite_spark.operators.graph_algos import betweenness_centrality
    df, edges = graph
    adj = _adj(edges)
    cb = defaultdict(float)
    for s in adj:                      # textbook Brandes
        stack, preds = [], defaultdict(list)
        sigma = defaultdict(int)
        sigma[s] = 1
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            stack.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = defaultdict(float)
        while stack:
            w = stack.pop()
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                cb[w] += delta[w]
    got = {r["id"]: r["betweenness"]
           for r in betweenness_centrality(df).collect()}
    for v in adj:
        assert abs(got[v] - cb[v] / 2) < 2e-3, v


def test_k_core_vs_python(graph):
    from gqlite_spark.operators.graph_algos import k_core
    df, edges = graph
    for k in (3, 5, 7):
        adj = {v: set(ns) for v, ns in _adj(edges).items()}
        changed = True
        while changed:                 # reference peeling
            drop = [v for v, ns in adj.items() if len(ns) < k]
            changed = bool(drop)
            for v in drop:
                for w in adj[v]:
                    adj[w].discard(v)
                del adj[v]
        got = {r["id"]: r["core_degree"] for r in k_core(df, k).collect()}
        assert set(got) == set(adj), k
        assert all(got[v] == len(adj[v]) for v in adj), k


def test_clustering_and_jaccard_vs_python(graph):
    from gqlite_spark.operators.graph_algos import (clustering_coefficient,
                                                    neighborhood_jaccard)
    df, edges = graph
    adj = _adj(edges)
    cc = {r["id"]: r for r in clustering_coefficient(df).collect()}
    for v, ns in adj.items():
        tri = sum(1 for a in ns for b in ns if a < b and b in adj[a])
        d = len(ns)
        want = round(tri / (d * (d - 1) / 2), 4) if d >= 2 else 0.0
        assert cc[v]["degree"] == d and cc[v]["triangles"] == tri
        assert abs(cc[v]["coefficient"] - want) < 2e-4, v
    jac = {(r["src"], r["dst"]): r["jaccard"]
           for r in neighborhood_jaccard(df).collect()}
    assert set(jac) == set(edges)
    for (a, b) in edges:
        inter = len(adj[a] & adj[b])
        want = round(inter / len(adj[a] | adj[b]), 4)
        assert abs(jac[(a, b)] - want) < 2e-4, (a, b)


def test_label_propagation_vs_python(graph):
    from gqlite_spark.operators.graph_algos import label_propagation
    df, edges = graph
    adj = _adj(edges)
    labels = {v: v for v in adj}
    for _ in range(4):                 # synchronous, min tie-break
        new = {}
        for v, ns in adj.items():
            counts = defaultdict(int)
            for w in ns:
                counts[labels[w]] += 1
            new[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = new
    got = {r["id"]: r["label"]
           for r in label_propagation(df, iterations=4).collect()}
    assert got == labels
