"""Batched seq-to-graph POA DP (the TPU fast path for the graph engine).

Replaces abPOA's SIMD seq-to-DAG alignment (SURVEY §2.2) the XLA way: the
graph lives on the host as columnar padded arrays in topological-rank
space, and the O(nodes x query) DP runs as one jitted `lax.fori_loop` over
ranks with full-row vector ops, `vmap`ped over a batch of (graph, query)
problems — many isoforms' reads aligned per device dispatch. Traceback
(cheap, sequential) walks the returned pointer matrices on the host and
feeds `PoaGraph.apply_path`.

Bit-identical contract: scores, tie-breaks (first-max predecessor, diag >=
delete, strict > insertion), band semantics, and traceback order all match
`PoaGraph.align` (tests/test_poa.py asserts equality), so the kernel and
the Python engine are interchangeable per read.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mandalorion_tpu.poa.graph import NEG, PoaGraph, PoaParams

# one batched DP dispatch is chunked to stay under this many DP cells
# (score + 2 pointer matrices ~ 9 bytes/cell: 256M cells ~ 2.3 GB, well
# inside a v5e's 16 GB HBM while leaving room for donation copies)
MAX_CELLS_PER_DISPATCH = 256 * 1024 * 1024


def _pow2_at_least(n: int, floor: int = 64) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


def graph_arrays(graph: PoaGraph, n_cap: int, p_cap: int,
                 order: Optional[List[int]] = None
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[int]]:
    """Columnar rank-space arrays for one graph, padded to (n_cap, p_cap):
    (base_r, preds_r, is_end_r, order). preds_r holds predecessor ranks + 1
    (0 = virtual source row), -1 padding."""
    if order is None:
        order = graph.topo_order()
    rank = {v: r for r, v in enumerate(order)}
    n = len(order)
    base_r = np.zeros(n_cap, np.int32)
    preds_r = np.full((n_cap, p_cap), -1, np.int32)
    is_end_r = np.zeros(n_cap, bool)
    for r, v in enumerate(order):
        base_r[r] = graph.base[v]
        ps = graph.preds[v]
        if ps:
            for c, u in enumerate(ps):
                preds_r[r, c] = rank[u] + 1
        else:
            preds_r[r, 0] = 0
        is_end_r[r] = not graph.succs[v]
    return base_r, preds_r, is_end_r, order


def _align_rows(base_r, preds_r, n_nodes, q, qlen, n_hi,
                match: int, mismatch: int, gap: int, band: int):
    """One (graph, query) DP, shapes static. Returns (score, ptr_node,
    ptr_op) matrices of shape (N+1, L+1). Vmapped over the batch axis by
    the caller."""
    n_cap = base_r.shape[0]
    l_cap = q.shape[0]
    width = l_cap + 1
    jidx = jnp.arange(width, dtype=jnp.int32)

    # band per rank from ACTUAL sizes (PoaGraph.align band semantics)
    eff_band = jnp.maximum(band, jnp.abs(n_nodes - qlen) + 16)

    score0 = jnp.full((n_cap + 1, width), NEG, jnp.int32)
    score0 = score0.at[0].set(-gap * jidx)
    ptrn0 = jnp.full((n_cap + 1, width), -2, jnp.int32)
    ptro0 = jnp.zeros((n_cap + 1, width), jnp.uint8)
    ptro0 = ptro0.at[0].set(1)

    p_cap = preds_r.shape[1]

    def body(r, carry):
        score, ptrn, ptro = carry
        base_v = base_r[r - 1]
        sub = jnp.where(q == base_v, match, -mismatch).astype(jnp.int32)
        # first-max over predecessors in declared order (strict >)
        best_prev = jnp.full(width, NEG, jnp.int32)
        best_rank = jnp.full(width, -2, jnp.int32)
        for p in range(p_cap):
            pr = preds_r[r - 1, p]
            row_p = jax.lax.dynamic_index_in_dim(
                score, jnp.maximum(pr, 0), axis=0, keepdims=False)
            row_p = jnp.where(pr >= 0, row_p, NEG)
            better = row_p > best_prev
            best_prev = jnp.where(better, row_p, best_prev)
            best_rank = jnp.where(better, pr, best_rank)
        diag = best_prev[:-1] + sub          # consume query base
        dele = best_prev[1:] - gap           # skip node
        use_diag = diag >= dele
        row = jnp.concatenate(
            [best_prev[:1] - gap, jnp.where(use_diag, diag, dele)])
        rowp = jnp.concatenate(
            [best_rank[:1],
             jnp.where(use_diag, best_rank[:-1], best_rank[1:])])
        rowo = jnp.concatenate(
            [jnp.full(1, 2, jnp.uint8),
             jnp.where(use_diag, jnp.uint8(0), jnp.uint8(2))])
        # insertion prefix-max scan (linear gap)
        acc = jax.lax.cummax(row + gap * jidx) - gap * jidx
        ins_better = acc > row
        row = jnp.where(ins_better, acc, row)
        rowo = jnp.where(ins_better, jnp.uint8(1), rowo)
        rowp = jnp.where(ins_better, -1, rowp)
        # band mask (row values only; pointers stay, as in the oracle)
        center = r * qlen // jnp.maximum(n_nodes, 1)
        j0 = jnp.maximum(0, center - eff_band)
        j1 = jnp.minimum(qlen, center + eff_band)
        masked = (jidx >= 1) & ((jidx < j0) | (jidx > j1))
        row = jnp.where(masked, NEG, row)
        score = jax.lax.dynamic_update_slice(score, row[None], (r, 0))
        ptrn = jax.lax.dynamic_update_slice(ptrn, rowp[None], (r, 0))
        ptro = jax.lax.dynamic_update_slice(ptro, rowo[None], (r, 0))
        return score, ptrn, ptro

    # n_hi: the batch's actual max node count (traced scalar — rows past
    # any item's own n are computed but never read; rows past n_hi are
    # skipped entirely, which matters when padding rounds n_cap up)
    return jax.lax.fori_loop(1, n_hi + 1, body, (score0, ptrn0, ptro0))


def _align_traceback(base_r, preds_r, n_nodes, is_end_r, q, qlen, n_hi,
                     match: int, mismatch: int, gap: int, band: int):
    """DP + on-device traceback for one problem. The pointer matrices
    (O(nodes x query), hundreds of MB per batch) never leave the device —
    only the path steps (O(nodes + query) ints) are returned:
    (steps[k] = (qi, rank), n_steps), written in reverse order.
    qi == -1: node deleted; rank == -1: query base inserted."""
    score, ptrn, ptro = _align_rows(base_r, preds_r, n_nodes, q, qlen,
                                    n_hi, match, mismatch, gap, band)
    n_cap = base_r.shape[0]
    l_cap = q.shape[0]
    # end rank: first max of score[r, qlen] over real end ranks — argmax's
    # first-occurrence rule IS PoaGraph.align's ascending-order tie-break
    col = jax.lax.dynamic_index_in_dim(score.T, qlen, axis=0,
                                       keepdims=False)
    end_mask = jnp.concatenate([jnp.zeros(1, bool), is_end_r])
    end_mask &= jnp.arange(n_cap + 1) <= n_nodes
    br = jnp.argmax(jnp.where(end_mask, col, NEG - 1)).astype(jnp.int32)

    max_steps = n_cap + l_cap + 2
    buf0 = jnp.zeros((max_steps, 2), jnp.int32)

    def cond(c):
        r, j, k, _ = c
        return ((r > 0) | (j > 0)) & (r >= 0) & (k < max_steps)

    def step(c):
        r, j, k, buf = c
        op = ptro[r, j]  # row 0 is initialized to op 1 (insertion run)
        qi = jnp.where(op == 2, -1, j - 1)
        rank = jnp.where(op == 1, -1, r - 1)
        buf = jax.lax.dynamic_update_slice(
            buf, jnp.stack([qi, rank])[None].astype(jnp.int32), (k, 0))
        pr = ptrn[r, j]
        r = jnp.where(op == 1, r, pr)
        j = jnp.where(op == 2, j, j - 1)
        return r, j, k + 1, buf

    _, _, k, buf = jax.lax.while_loop(
        cond, step, (br, jnp.int32(qlen), jnp.int32(0), buf0))
    return buf, k


_align_traceback_batch = jax.jit(
    jax.vmap(_align_traceback,
             in_axes=(0, 0, 0, 0, 0, 0, None, None, None, None, None)),
    static_argnames=("match", "mismatch", "gap", "band"))


def align_graph_batch(graphs: Sequence[PoaGraph],
                      queries: Sequence[np.ndarray],
                      params: Optional[PoaParams] = None
                      ) -> List[List[Tuple[int, Optional[int]]]]:
    """Align query[i] to graph[i] for every i in one (chunked) device
    dispatch; returns alignment paths for PoaGraph.apply_path."""
    params = params or PoaParams()
    assert len(graphs) == len(queries)
    if not graphs:
        return []
    orders = [g.topo_order() for g in graphs]
    n_cap = _pow2_at_least(max(len(o) for o in orders))
    l_cap = _pow2_at_least(max(len(q) for q in queries))
    p_max = max(1, max((len(g.preds[v]) for g in graphs
                        for v in range(len(g.base))), default=1))
    p_cap = _pow2_at_least(p_max, floor=4)  # bucketed: caps recompiles
    per_item = (n_cap + 1) * (l_cap + 1)
    chunk = max(1, MAX_CELLS_PER_DISPATCH // per_item)
    paths: List[List[Tuple[int, Optional[int]]]] = []
    for c0 in range(0, len(graphs), chunk):
        batch = list(range(c0, min(c0 + chunk, len(graphs))))
        base = np.zeros((len(batch), n_cap), np.int32)
        preds = np.full((len(batch), n_cap, p_cap), -1, np.int32)
        ends = np.zeros((len(batch), n_cap), bool)
        nn = np.zeros(len(batch), np.int32)
        qq = np.zeros((len(batch), l_cap), np.int32)
        ql = np.zeros(len(batch), np.int32)
        for bi, gi in enumerate(batch):
            b, p, e, _ = graph_arrays(graphs[gi], n_cap, p_cap, orders[gi])
            base[bi], preds[bi], ends[bi] = b, p, e
            nn[bi] = len(orders[gi])
            q = queries[gi]
            qq[bi, :len(q)] = q
            ql[bi] = len(q)
        from mandalorion_tpu.parallel.mesh import pipeline_mesh, shard_batch
        mesh = pipeline_mesh()
        if mesh is not None:
            # the per-locus isoform axis shards over the mesh ('loci'):
            # each device aligns its shard of (graph, query) problems;
            # zero-padded rows (n_nodes=0, qlen=0) produce empty paths
            # and are sliced off
            args, b = shard_batch(mesh, [base, preds, nn, ends, qq, ql])
            buf, ks = _align_traceback_batch(
                *args, jnp.int32(int(nn.max())),
                params.match, params.mismatch, params.gap, params.band)
            buf = np.asarray(buf)[:b]
            ks = np.asarray(ks)[:b]
        else:
            buf, ks = _align_traceback_batch(
                base, preds, nn, ends, qq, ql, jnp.int32(int(nn.max())),
                params.match, params.mismatch, params.gap, params.band)
            buf = np.asarray(buf)
            ks = np.asarray(ks)
        for bi, gi in enumerate(batch):
            order = orders[gi]
            steps = buf[bi, :ks[bi]][::-1]
            paths.append([(int(qi), order[rank] if rank >= 0 else None)
                          for qi, rank in steps])
    return paths


def poa_consensus_batch(seq_sets: Sequence[List[np.ndarray]],
                        params: Optional[PoaParams] = None
                        ) -> List[np.ndarray]:
    """Graph-POA consensus of many isoforms at once: reads are threaded in
    lockstep rounds — round k aligns the k-th read of every still-growing
    graph in one batched dispatch (the per-locus isoform axis, mirroring
    the reference's one-abpoa-process-per-isoform at SDC.py:915-919)."""
    params = params or PoaParams()
    graphs = [PoaGraph(s[0]) for s in seq_sets]
    max_reads = max((len(s) for s in seq_sets), default=0)
    for k in range(1, max_reads):
        live = [i for i, s in enumerate(seq_sets) if k < len(s)]
        if not live:
            break
        paths = align_graph_batch([graphs[i] for i in live],
                                  [seq_sets[i][k] for i in live], params)
        for i, path in zip(live, paths):
            graphs[i].apply_path(seq_sets[i][k], path)
    return [g.consensus() for g in graphs]
