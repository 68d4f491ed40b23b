"""Rectangular linear-sum-assignment (Hungarian) from scratch.

The reference solves per-pair line matching with
``scipy.optimize.linear_sum_assignment`` (/root/reference/app/features.py:67-94);
scipy is unavailable here.  This is the standard O(n²·m) shortest-augmenting-
path algorithm with dual potentials (Jonker-Volgenant style), returning the
same optimal assignment for cost matrices up to the reference's 200×200 cap.
"""
from __future__ import annotations

import numpy as np

# widest (post-transpose) matrix routed through the Python-list path; tests
# set this to 0 to force the numpy path for equivalence checks
_LIST_PATH_MAX = 64


def linear_sum_assignment(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimize sum(cost[row_ind, col_ind]); len == min(n_rows, n_cols).

    Returns (row_ind, col_ind) with row_ind sorted ascending, matching the
    scipy contract for rectangular matrices.
    """
    cost = np.asarray(cost, dtype=np.float64)
    if cost.ndim != 2:
        raise ValueError("cost must be 2-D")
    n, m = cost.shape
    # single-row/column fast paths: the optimum is the argmin, and np.argmin's
    # first-minimum tie-break matches the strict `minv[j] < delta` scan below
    if n == 1 and m >= 1:
        return (np.array([0], dtype=np.int64),
                np.array([int(np.argmin(cost[0]))], dtype=np.int64))
    if m == 1 and n >= 1:
        return (np.array([int(np.argmin(cost[:, 0]))], dtype=np.int64),
                np.array([0], dtype=np.int64))
    transposed = n > m
    if transposed:
        cost = cost.T
        n, m = m, n
    if m <= _LIST_PATH_MAX:
        # small-matrix path: the SAME algorithm over Python lists — numpy
        # scalar indexing and the per-row np.full/np.zeros allocations
        # dominate at line-matching sizes (2–10 lines).  Python floats are
        # IEEE doubles and every operation below associates exactly like
        # the array version ((cost − u) − v elementwise), so results are
        # bit-identical (pinned by test_hungarian_list_path_identical).
        C = cost.tolist()
        u = [0.0] * (n + 1)
        v = [0.0] * (m + 1)
        p = [0] * (m + 1)
        way = [0] * (m + 1)
        INF_ = float("inf")
        for i in range(1, n + 1):
            p[0] = i
            j0 = 0
            minv = [INF_] * (m + 1)
            used = [False] * (m + 1)
            while True:
                used[j0] = True
                i0 = p[j0]
                delta = INF_
                j1 = 0
                row = C[i0 - 1]
                ui0 = u[i0]
                for j in range(1, m + 1):
                    if used[j]:
                        continue
                    c = (row[j - 1] - ui0) - v[j]
                    if c < minv[j]:
                        minv[j] = c
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
        row_of_col = p[1:]
        rows = []
        cols = []
        for j in range(m):
            if row_of_col[j] != 0:
                rows.append(row_of_col[j] - 1)
                cols.append(j)
        row_ind = np.array(rows, dtype=np.int64)
        col_ind = np.array(cols, dtype=np.int64)
        order = np.argsort(row_ind, kind="stable")
        row_ind, col_ind = row_ind[order], col_ind[order]
        if transposed:
            return col_ind, row_ind
        return row_ind, col_ind
    # 1-indexed potentials/matching (classic formulation)
    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)   # p[j] = row assigned to column j
    way = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            cur = cost[i0 - 1, :] - u[i0] - v[1:]
            for j in range(1, m + 1):
                if used[j]:
                    continue
                c = cur[j - 1]
                if c < minv[j]:
                    minv[j] = c
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
    row_of_col = p[1:]  # row assigned to column j (0 = unassigned)
    rows = []
    cols = []
    for j in range(m):
        if row_of_col[j] != 0:
            rows.append(row_of_col[j] - 1)
            cols.append(j)
    row_ind = np.array(rows, dtype=np.int64)
    col_ind = np.array(cols, dtype=np.int64)
    order = np.argsort(row_ind, kind="stable")
    row_ind, col_ind = row_ind[order], col_ind[order]
    if transposed:
        return col_ind, row_ind
    return row_ind, col_ind
