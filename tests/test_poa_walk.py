"""Pallas reverse-sweep traceback vs the XLA walk (interpret mode).

The sweep kernel (poa/pallas_kernel.py _poa_walk_kernel) emits
run-compressed records; expanded, they must reproduce the XLA walk's
(qi, rank) step sequence EXACTLY — same steps, same reverse order — on
randomized multi-read graphs (branches, insertions, deletions, band
shifts), including padding problems and the row-0 boundary run.
"""

import numpy as np

import synthdata
from mandalorion_tpu.align.encode import encode
from mandalorion_tpu.poa.graph import PoaGraph, PoaParams
from mandalorion_tpu.poa import kernels as kn
from mandalorion_tpu.poa import pallas_kernel as pk


def _walk_both(sets, params, seed=0):
    """Build mature graphs (all but the last read threaded), then compare
    both walks aligning the last read."""
    graphs = [PoaGraph(s[0]) for s in sets]
    for g, s in zip(graphs, sets):
        for q in s[1:-1]:
            g.apply_path(q, g.align(q, params))
    queries = [s[-1] for s in sets]
    orders = [g.topo_order() for g in graphs]
    n_cap = kn._pow2_at_least(max(len(o) for o in orders))
    l_cap = kn._pow2_at_least(max(len(q) for q in queries))
    p_cap = kn._pow2_at_least(
        max(len(g.preds[v]) for g in graphs
            for v in range(len(g.base))), floor=4)
    W = kn._item_width(n_cap, l_cap, params.band, l_cap, True)
    Bp = 8
    base = np.zeros((Bp, n_cap), np.int32)
    preds = np.full((Bp, n_cap, p_cap), -1, np.int32)
    ends = np.zeros((Bp, n_cap), bool)
    nn = np.zeros(Bp, np.int32)
    qq = np.zeros((Bp, l_cap), np.int32)
    ql = np.zeros(Bp, np.int32)
    for bi, g in enumerate(graphs):
        b, p, e, _ = kn.graph_arrays(g, n_cap, p_cap, orders[bi])
        base[bi], preds[bi], ends[bi] = b, p, e
        nn[bi] = len(orders[bi])
        q = queries[bi]
        qq[bi, :len(q)] = q
        ql[bi] = len(q)
    pp = params
    mats = pk.poa_forward_pallas(
        base, preds, nn, qq, ql, int(nn.max()), pp.match, pp.mismatch,
        pp.gap_open, pp.gap_extend, pp.gap_open2, pp.gap_extend2,
        pp.band, W, interpret=True)
    buf, ks = kn._traceback_from_mats_batch(
        preds, nn, ends, ql, *mats, pp.gap_open, pp.gap_extend,
        pp.gap_open2, pp.gap_extend2, W, l_cap)
    buf = np.asarray(buf)
    ks = np.asarray(ks)
    recs, counts = pk.poa_walk_pallas(mats, nn, ends, ql, int(nn.max()),
                                      interpret=True)
    recs = np.asarray(recs)
    counts = np.asarray(counts)
    return graphs, buf, ks, recs, counts


def test_sweep_walk_matches_xla_walk():
    rng = np.random.default_rng(11)
    sets = []
    for i in range(3):
        true = synthdata.make_genome(220, seed=40 + i)
        sets.append([encode(synthdata.mutate_read(true, rng, 0.06)[0])
                     for _ in range(4)])
    params = PoaParams(band=18, adaptive=True)
    graphs, buf, ks, recs, counts = _walk_both(sets, params)
    for bi in range(len(graphs)):
        want = buf[bi, :ks[bi]]
        got = pk.expand_walk_records(recs[:, 16 * bi:16 * bi + 2], int(counts[bi]))
        assert got.shape == want.shape, (bi, got.shape, want.shape)
        assert (got == want).all(), bi
    # padding problems emit nothing
    for bi in range(len(graphs), 8):
        assert counts[bi] == 0


def test_sweep_walk_indel_heavy():
    """Insertion runs (incl. multi-column runs and the row-0 boundary
    run) compress to records; expansion must match step for step."""
    rng = np.random.default_rng(3)
    sets = []
    for i in range(2):
        true = synthdata.make_genome(260, seed=60 + i)
        reads = []
        for _ in range(4):
            r = true
            for _k in range(4):
                p = int(rng.integers(10, len(r) - 10))
                if rng.random() < 0.5:
                    r = r[:p] + r[p + int(rng.integers(1, 6)):]
                else:
                    ins = "".join("ACGT"[int(b)]
                                  for b in rng.integers(0, 4, 5))
                    r = r[:p] + ins + r[p:]
            reads.append(encode(r))
        sets.append(reads)
    params = PoaParams(band=16, adaptive=True)
    graphs, buf, ks, recs, counts = _walk_both(sets, params)
    for bi in range(len(graphs)):
        want = buf[bi, :ks[bi]]
        got = pk.expand_walk_records(recs[:, 16 * bi:16 * bi + 2], int(counts[bi]))
        assert got.shape == want.shape
        assert (got == want).all()


def test_sweep_walk_e2e_consensus(monkeypatch):
    """MANDO_POA_SWEEP=1 routes the native consensus batch through the
    sweep walk + C record expansion; consensi must equal the default
    (XLA-walk) path exactly."""
    from mandalorion_tpu.poa.kernels import poa_consensus_batch
    rng = np.random.default_rng(21)
    sets = []
    for i in range(2):
        true = synthdata.make_genome(200, seed=70 + i)
        sets.append([encode(synthdata.mutate_read(true, rng, 0.04)[0])
                     for _ in range(4)])
    params = PoaParams(band=16, adaptive=True)
    monkeypatch.setenv("MANDO_POA_PALLAS", "interpret")
    base = poa_consensus_batch(sets, params)
    monkeypatch.setenv("MANDO_POA_SWEEP", "1")
    swept = poa_consensus_batch(sets, params)
    for a, b in zip(base, swept):
        assert (a == b).all()
