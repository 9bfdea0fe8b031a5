"""Partial-order alignment graph: sequence-to-DAG DP + heaviest bundle.

The graph is columnar: node base codes, edge lists, edge weights. Each read
is globally aligned to the DAG (nodes in topological order × banded query
window); the traceback path adds nodes/edges with read support. Consensus =
heaviest-bundle path (max edge-weight DP over topological order), abPOA's
`-r 0` output mode.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

NEG = -(10 ** 9)


@dataclass
class PoaParams:
    match: int = 5          # abPOA -M 5
    mismatch: int = 4
    gap: int = 4            # linear gap (v1; abPOA default is convex affine)
    band: int = 128         # query band half-width around node rank diagonal


class PoaGraph:
    def __init__(self, seq_codes: np.ndarray):
        n = len(seq_codes)
        self.base: List[int] = [int(b) for b in seq_codes]
        self.preds: List[List[int]] = [[] for _ in range(n)]
        self.succs: List[List[int]] = [[] for _ in range(n)]
        self.edge_w: Dict[Tuple[int, int], int] = {}
        for i in range(1, n):
            self._add_edge(i - 1, i)
        self.starts: List[int] = [0] if n else []

    def _add_edge(self, u: int, v: int) -> None:
        if (u, v) not in self.edge_w:
            self.edge_w[(u, v)] = 0
            self.preds[v].append(u)
            self.succs[u].append(v)
        self.edge_w[(u, v)] += 1

    def _add_node(self, base: int) -> int:
        self.base.append(base)
        self.preds.append([])
        self.succs.append([])
        return len(self.base) - 1

    def topo_order(self) -> List[int]:
        n = len(self.base)
        indeg = np.zeros(n, np.int64)
        for v in range(n):
            indeg[v] = len(self.preds[v])
        from collections import deque
        dq = deque([v for v in range(n) if indeg[v] == 0])
        order = []
        while dq:
            u = dq.popleft()
            order.append(u)
            for v in self.succs[u]:
                indeg[v] -= 1
                if indeg[v] == 0:
                    dq.append(v)
        return order

    # ------------------------------------------------------------- align

    def align(self, q: np.ndarray, params: PoaParams
              ) -> List[Tuple[int, Optional[int]]]:
        """Global banded alignment of query codes vs the graph.
        Returns the path as (query_index | -1, node | None) steps:
        (qi, node)   — query base qi aligned to node (match or mismatch)
        (qi, None)   — query base qi inserted (new node needed)
        (-1, node)   — node deleted (skipped).
        """
        order = self.topo_order()
        rank = {v: r for r, v in enumerate(order)}
        n, L = len(order), len(q)
        band = max(params.band, abs(n - L) + 16)
        lo = np.maximum(0, np.arange(1, n + 1) * L // max(n, 1) - band)
        hi = np.minimum(L, np.arange(1, n + 1) * L // max(n, 1) + band)

        # score[r] over full query axis (memory L+1 per node; fine for v1)
        score = np.full((n + 1, L + 1), NEG, np.int64)
        ptr_node = np.full((n + 1, L + 1), -2, np.int64)  # pred rank or -1
        ptr_op = np.zeros((n + 1, L + 1), np.uint8)  # 0 diag 1 ins 2 del
        score[0, :] = -params.gap * np.arange(L + 1)
        ptr_op[0, :] = 1
        gap = params.gap

        for r, v in enumerate(order, start=1):
            pred_ranks = [rank[u] + 1 for u in self.preds[v]]
            if not pred_ranks:
                pred_ranks = [0]
            j0, j1 = int(lo[r - 1]), int(hi[r - 1])
            base_v = self.base[v]
            sub = np.where(q == base_v, params.match, -params.mismatch)
            best_prev = np.full(L + 1, NEG, np.int64)
            best_prev_rank = np.full(L + 1, -2, np.int64)
            for pr in pred_ranks:
                better = score[pr] > best_prev
                best_prev = np.where(better, score[pr], best_prev)
                best_prev_rank = np.where(better, pr, best_prev_rank)
            diag = best_prev[:-1] + sub          # consume query base
            dele = best_prev[1:] - gap           # skip node
            row = np.full(L + 1, NEG, np.int64)
            rowp = np.full(L + 1, -2, np.int64)
            rowo = np.zeros(L + 1, np.uint8)
            row[0] = best_prev[0] - gap
            rowp[0] = best_prev_rank[0]
            rowo[0] = 2
            use_diag = diag >= dele
            row[1:] = np.where(use_diag, diag, dele)
            rowp[1:] = np.where(use_diag, best_prev_rank[:-1],
                                best_prev_rank[1:])
            rowo[1:] = np.where(use_diag, 0, 2)
            # insertions within the row: with linear gaps the run is a
            # prefix-max scan, fully vectorized:
            # row[j] = max(row0[j], max_{j'<j}(row0[j'] + g*j') - g*j)
            jidx = np.arange(L + 1, dtype=np.int64)
            acc = np.maximum.accumulate(row + gap * jidx) - gap * jidx
            ins_better = acc > row
            row = np.where(ins_better, acc, row)
            rowo = np.where(ins_better, np.uint8(1), rowo)
            rowp = np.where(ins_better, -1, rowp)
            # mask outside band (keep j0..j1 plus column 0)
            if j0 > 1:
                row[1:j0] = NEG
            if j1 < L:
                row[j1 + 1:] = NEG
            score[r] = row
            ptr_node[r] = rowp
            ptr_op[r] = rowo

        # best end: max over rows of nodes with no successors at column L
        end_ranks = [rank[v] + 1 for v in order if not self.succs[v]]
        if not end_ranks:
            end_ranks = [n]
        br = max(end_ranks, key=lambda rr: score[rr, L])
        path: List[Tuple[int, Optional[int]]] = []
        r, j = br, L
        while r > 0 or j > 0:
            op = ptr_op[r, j]
            if r == 0:
                path.append((j - 1, None))
                j -= 1
                continue
            v = order[r - 1]
            if op == 0:
                path.append((j - 1, v))
                pr = int(ptr_node[r, j])
                r, j = pr, j - 1
            elif op == 1:
                path.append((j - 1, None))
                j -= 1
            else:
                path.append((-1, v))
                r = int(ptr_node[r, j])
        path.reverse()
        return path

    # ---------------------------------------------------------- add read

    def add_read(self, q: np.ndarray, params: PoaParams) -> None:
        self.apply_path(q, self.align(q, params))

    def apply_path(self, q: np.ndarray,
                   path: List[Tuple[int, Optional[int]]]) -> None:
        """Thread query q into the graph along an alignment path (the
        mutation half of add_read; the batched kernel computes paths for
        many graphs at once and applies them here)."""
        prev_node = -1
        for qi, node in path:
            if qi == -1:
                continue  # deletion: no query base, no edge traversed
            if node is not None and self.base[node] == int(q[qi]):
                cur = node
            else:
                cur = self._add_node(int(q[qi]))
            if prev_node >= 0:
                self._add_edge(prev_node, cur)
            else:
                if cur not in self.starts:
                    self.starts.append(cur)
            prev_node = cur

    # --------------------------------------------------------- consensus

    def consensus(self) -> np.ndarray:
        """Heaviest-bundle path: maximize summed edge weight."""
        order = self.topo_order()
        n = len(order)
        if n == 0:
            return np.zeros(0, np.uint8)
        best = {v: 0 for v in order}
        back: Dict[int, int] = {}
        for v in order:
            for u in self.preds[v]:
                w = self.edge_w[(u, v)]
                cand = best[u] + w
                if cand > best.get(v, NEG):
                    best[v] = cand
                    back[v] = u
        end = max(order, key=lambda v: best[v])
        out = [end]
        while out[-1] in back:
            out.append(back[out[-1]])
        out.reverse()
        return np.array([self.base[v] for v in out], np.uint8)


MAX_GRAPH_LEN = 20_000  # DP rows are O(nodes x len); guard runaway memory


def poa_consensus(seq_codes_list: List[np.ndarray],
                  params: Optional[PoaParams] = None) -> np.ndarray:
    """Consensus of oriented sequences (codes)."""
    params = params or PoaParams()
    longest = max(len(s) for s in seq_codes_list)
    if longest > MAX_GRAPH_LEN:
        raise ValueError(
            f"graph POA engine capped at {MAX_GRAPH_LEN} nt (got {longest});"
            " use the star engine (PoaConfig.engine='star') for long reads")
    graph = PoaGraph(seq_codes_list[0])
    for q in seq_codes_list[1:]:
        graph.add_read(q, params)
    return graph.consensus()
