"""Bipartite minimum-cost assignment (Hungarian algorithm) and the
graph-edit-distance heuristic built on it.

Reference parity: src/operand/algorithms/Hungarian.cpp:80-216 (FULL, tested
by test/algorithm.cpp) and the bipartite GED heuristic declared at
include/operand/distance/EditDistance.h (STUB there; implemented here).

This is a small-matrix, driver-side computation by nature (O(n³) with a
global state — not distributable for one instance).  The distributed story
is MANY instances: ``assign_pairs_distributed`` runs one assignment per
group via applyInPandas, so a 100 TB corpus of (graph_a, graph_b) pairs
fans out one small solve per pair across executors.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def hungarian(cost: "np.ndarray | Sequence[Sequence[float]]") -> tuple[list[int], float]:
    """Minimum-cost assignment on an n×m cost matrix (n ≤ m).

    Returns (assignment, total_cost) where assignment[i] = column of row i.
    O(n²m) potentials implementation.
    """
    a = np.asarray(cost, dtype=float)
    transposed = False
    if a.shape[0] > a.shape[1]:
        a = a.T
        transposed = True
    n, m = a.shape
    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)        # p[j] = row matched to column j (1-based)
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = a[i0 - 1][j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    assignment = [-1] * n
    for j in range(1, m + 1):
        if p[j]:
            assignment[p[j] - 1] = j - 1
    total = sum(a[i][assignment[i]] for i in range(n))
    if transposed:
        # invert mapping back to original row space
        inv = [-1] * m
        for i, j in enumerate(assignment):
            inv[j] = i
        return inv, total
    return assignment, total


def graph_edit_distance(degrees_a: Sequence[int],
                        degrees_b: Sequence[int]) -> float:
    """Bipartite GED heuristic: assignment over degree vectors with
    substitution cost |da − db| and insert/delete cost = degree
    (EditDistance.h intent; lower bound of true GED)."""
    na, nb = len(degrees_a), len(degrees_b)
    n = na + nb
    cost = np.zeros((n, n))
    BIG = float(sum(degrees_a) + sum(degrees_b) + 1)
    for i in range(n):
        for j in range(n):
            if i < na and j < nb:
                cost[i][j] = abs(degrees_a[i] - degrees_b[j])
            elif i < na:
                cost[i][j] = degrees_a[i] if (j - nb) == i else BIG
            elif j < nb:
                cost[i][j] = degrees_b[j] if (i - na) == j else BIG
            else:
                cost[i][j] = 0.0
    _, total = hungarian(cost)
    return total


def assign_pairs_distributed(df, group_col: str, row_col: str, col_col: str,
                             cost_col: str):
    """Solve one assignment problem per group, distributed: the rows of each
    group form a cost matrix (row_col × col_col → cost_col).  Returns
    (group, row, col, cost) for the chosen assignment.

    applyInPandas keys the shuffle on the group id; each executor solves its
    groups independently — the many-small-instances scale path.
    """
    import pandas as pd

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(pdf[row_col].unique())
        cols = sorted(pdf[col_col].unique())
        ri = {r: i for i, r in enumerate(rows)}
        ci = {c: i for i, c in enumerate(cols)}
        mat = np.full((len(rows), len(cols)), pdf[cost_col].max() * 10 + 1.0)
        for _, rec in pdf.iterrows():
            mat[ri[rec[row_col]]][ci[rec[col_col]]] = rec[cost_col]
        swap = mat.shape[0] > mat.shape[1]
        assignment, _ = hungarian(mat)
        out = []
        gval = pdf[group_col].iloc[0]
        for i, j in enumerate(assignment):
            if j >= 0:
                out.append((gval, rows[i], cols[j], mat[i][j]))
        return pd.DataFrame(out, columns=[group_col, row_col, col_col,
                                          cost_col])

    schema = ", ".join([
        f"{group_col} long", f"{row_col} long", f"{col_col} long",
        f"{cost_col} double"])
    return df.groupBy(group_col).applyInPandas(solve, schema)
