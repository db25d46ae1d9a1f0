"""Landmark-centrality approximation probe (VERDICT r5 #7): put a NUMBER
on the accuracy cost of the `_guard_all_sources` auto-landmark switch
(graph_algos.py — 64 md5-ordered landmarks above 10 k vertices).

Two scales of the tests' LCG pseudo-random graph (the 220-node stress
fixture's generator, scaled):

- n=2 000 / m=8 000: EXACT all-sources Python Brandes + all-vertices BFS
  closeness are feasible, so the 64-landmark Spark results are scored
  against ground truth: Spearman rank correlation over ALL vertices
  (betweenness) and per-landmark value agreement (closeness — landmark
  mode computes exact closeness for the sampled vertices, so the error
  is sampling coverage, not value error).
- n=20 000 / m=80 000 (the guard's actual trip regime): exact all-sources
  is the very explosion the guard prevents, so betweenness is scored
  against a 512-source Python Brandes reference (8× denser sampling) —
  convergence evidence — and closeness landmarks are verified value-exact
  against per-landmark Python BFS.

Usage: python tools/landmark_probe.py [--small-only]
Prints one JSON line per scale; paste the numbers into PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pseudo_edges(n: int, m: int, seed: int = 7) -> list[tuple[int, int]]:
    """The tests' LCG edge generator (test_graph_algos._pseudo_edges),
    parameterized — identical for Spark and the Python oracles."""
    x = seed
    out = []
    for _ in range(m):
        x = (1103515245 * x + 12345) % (2 ** 31)
        a = x % n
        x = (1103515245 * x + 12345) % (2 ** 31)
        b = x % n
        if a != b:
            out.append((a, b))
    return out


def pa_edges(n: int, m_per: int = 4, seed: int = 11) -> list[tuple[int, int]]:
    """Deterministic preferential-attachment (Barabási–Albert-style)
    generator: each new vertex attaches ``m_per`` times to the endpoint
    of an LCG-chosen existing edge stub — picking a uniform stub IS
    degree-proportional sampling, so the degree sequence is power-law
    (hubs), the regime where uniform landmark sampling under-covers the
    head of the betweenness distribution."""
    x = seed

    def rnd(mod: int) -> int:
        nonlocal x
        x = (1103515245 * x + 12345) % (2 ** 31)
        return x % mod

    edges = [(0, 1), (1, 2), (2, 0)]
    stubs = [0, 1, 1, 2, 2, 0]
    for v in range(3, n):
        for _ in range(m_per):
            u = stubs[rnd(len(stubs))]
            if u != v:
                edges.append((v, u))
                stubs.append(v)
                stubs.append(u)
    return edges


def adjacency(edges):
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def bfs_dist(adj, s):
    dist = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def closeness_exact(adj, vertices):
    out = {}
    for v in vertices:
        dist = bfs_dist(adj, v)
        total = sum(dist.values())
        out[v] = round((len(dist) - 1) / total, 4) if total else 0.0
    return out


def brandes(adj, sources):
    """Python Brandes restricted to `sources`; /2 to mirror the
    implementation's undirected halving."""
    bc = {v: 0.0 for v in adj}
    for s in sources:
        order, preds = [], {v: [] for v in adj}
        sigma = {v: 0 for v in adj}
        sigma[s] = 1
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
                    preds[w].append(u)
        delta = {v: 0.0 for v in adj}
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: x / 2 for v, x in bc.items()}


def spearman(xs: dict, ys: dict) -> float:
    """Spearman rank correlation over the common keys (average ranks for
    ties), pure Python."""
    keys = sorted(set(xs) & set(ys))

    def ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for k in range(i, j + 1):
                r[order[k]] = avg
            i = j + 1
        return r

    rx = ranks([xs[k] for k in keys])
    ry = ranks([ys[k] for k in keys])
    n = len(keys)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    return cov / (vx * vy) ** 0.5 if vx and vy else 0.0


def top_overlap(xs: dict, ys: dict, k: int) -> float:
    tx = {v for v, _ in sorted(xs.items(), key=lambda t: -t[1])[:k]}
    ty = {v for v, _ in sorted(ys.items(), key=lambda t: -t[1])[:k]}
    return len(tx & ty) / k


def md5_landmarks(spark, adj, n_landmarks: int) -> list[int]:
    from pyspark.sql import functions as F
    verts = spark.createDataFrame([(v,) for v in sorted(adj)], "id long")
    return [r["id"] for r in
            verts.orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
            .limit(n_landmarks).collect()]


def probe(spark, n: int, m: int, reference: str) -> dict:
    import warnings

    from gqlite_spark.operators.graph_algos import (betweenness_centrality,
                                                    closeness_centrality)
    edges = pseudo_edges(n, m)
    adj = adjacency(edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    landmarks = md5_landmarks(spark, adj, 64)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        close_lm = {r["id"]: r["closeness"] for r in closeness_centrality(
            e, auto_landmark_threshold=100, n_landmarks=64,
            landmark_mode="md5").collect()}
        bw_lm = {r["id"]: r["betweenness"] for r in betweenness_centrality(
            e, auto_landmark_threshold=100, n_landmarks=64,
            landmark_mode="md5").collect()}

    # closeness: landmark values must be EXACT for the sampled vertices
    close_exact_lm = closeness_exact(adj, landmarks)
    close_max_err = max(abs(close_lm[v] - close_exact_lm[v])
                        for v in landmarks)

    out = {"n": len(adj), "m": len(edges), "reference": reference,
           "closeness_landmark_max_abs_err": close_max_err,
           "n_landmarks": 64}

    if reference == "exact":
        close_all = closeness_exact(adj, sorted(adj))
        pop = sorted(close_all.values())
        samp = sorted(close_lm.values())
        out["closeness_sample_mean"] = round(sum(samp) / len(samp), 4)
        out["closeness_pop_mean"] = round(sum(pop) / len(pop), 4)
        bw_ref = brandes(adj, sorted(adj))
    else:
        bw_ref = brandes(adj, md5_landmarks(spark, adj, 512))
    out["betweenness_spearman"] = round(spearman(bw_lm, bw_ref), 4)
    out["betweenness_top50_overlap"] = round(top_overlap(bw_lm, bw_ref, 50), 4)
    return out


def probe_pa(spark, n: int = 20_000) -> dict:
    """Hub-graph landmark fidelity (VERDICT r6 next #4): on a power-law
    preferential-attachment fixture, score the √n auto-landmark default
    under BOTH selection modes — uniform md5 vs degree∪md5 mix — against
    a 512-source Brandes reference.  The number that matters is head
    fidelity (top-50 overlap): hubs carry most shortest paths, and a
    uniform sample that misses them misranks the head."""
    import warnings

    from gqlite_spark.operators.graph_algos import (_auto_landmark_count,
                                                    betweenness_centrality)
    edges = pa_edges(n)
    adj = adjacency(edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    n_lm = _auto_landmark_count(len(adj))
    bw_ref = brandes(adj, md5_landmarks(spark, adj, 512))

    out = {"n": len(adj), "m": len(edges), "fixture": "pref-attach",
           "n_landmarks": n_lm, "reference": "brandes-512src"}
    for mode in ("md5", "degree"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            bw = {r["id"]: r["betweenness"] for r in betweenness_centrality(
                e, auto_landmark_threshold=100, landmark_mode=mode)
                .collect()}
        out[f"betweenness_spearman_{mode}"] = round(spearman(bw, bw_ref), 4)
        out[f"betweenness_top50_overlap_{mode}"] = round(
            top_overlap(bw, bw_ref, 50), 4)

    # closeness HEAD COVERAGE: landmark closeness reports exact values
    # for the SAMPLED vertices only, so the question is whether the true
    # top-closeness vertices (≈ the hubs) are in the sample at all.
    # Ground-truth head: exact BFS closeness over the top-500-degree
    # vertices (on a PA graph the closeness head lives there).
    from gqlite_spark.operators.graph_algos import _guard_all_sources
    deg_order = sorted(adj, key=lambda v: (-len(adj[v]), v))
    head_pool = deg_order[:500]
    close = closeness_exact(adj, head_pool)
    true_head = {v for v, _ in
                 sorted(close.items(), key=lambda t: -t[1])[:50]}
    for mode in ("md5", "degree"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            picked = set(_guard_all_sources(e, None, "probe", 100, None,
                                            landmark_mode=mode))
        out[f"closeness_head50_coverage_{mode}"] = round(
            len(true_head & picked) / 50, 4)
    return out


def main():
    from gqlite_spark.session import get_spark
    spark = get_spark(app_name="landmark-probe")
    if "--pa" in sys.argv:
        print(json.dumps(probe_pa(spark)))
        return
    print(json.dumps(probe(spark, 2_000, 8_000, "exact")))
    if "--small-only" not in sys.argv:
        print(json.dumps(probe(spark, 20_000, 80_000, "brandes-512src")))


if __name__ == "__main__":
    main()
