"""Pallas POA forward kernel vs the XLA fori_loop forward pass.

Both feed the same traceback walk, so consensus equality across
randomized graphs exercises the full matrix contract (scores, tie-breaks,
band offsets, insertion origins). Runs the kernel in interpret mode on
the CPU test mesh; the compiled TPU build is exercised by the bench and
spot-check tools."""

import numpy as np
import pytest

import synthdata
from mandalorion_tpu.align.encode import encode, decode
from mandalorion_tpu.poa.graph import PoaGraph, PoaParams, poa_consensus
from mandalorion_tpu.poa.kernels import poa_consensus_batch


def _sets(n_iso, n_reads, length, err, seed0):
    rng = np.random.default_rng(seed0)
    sets = []
    for i in range(n_iso):
        true = synthdata.make_genome(length, seed=seed0 + i)
        sets.append([encode(synthdata.mutate_read(true, rng, err)[0])
                     for _ in range(n_reads)])
    return sets


@pytest.mark.parametrize("err,length", [(0.02, 250), (0.08, 400)])
def test_pallas_forward_matches_xla(monkeypatch, err, length):
    sets = _sets(3, 5, length, err, 77)
    params = PoaParams(band=20, adaptive=True)
    monkeypatch.setenv("MANDO_POA_PALLAS", "interpret")
    cons_pallas = poa_consensus_batch(sets, params)
    monkeypatch.setenv("MANDO_POA_PALLAS", "0")
    cons_xla = poa_consensus_batch(sets, params)
    for a, b in zip(cons_pallas, cons_xla):
        assert decode(a) == decode(b)


def test_pallas_matches_python_oracle(monkeypatch):
    sets = _sets(2, 6, 200, 0.03, 31)
    params = PoaParams(band=20, adaptive=True)
    monkeypatch.setenv("MANDO_POA_PALLAS", "interpret")
    cons_pallas = poa_consensus_batch(sets, params)
    for ss, got in zip(sets, cons_pallas):
        assert decode(poa_consensus(ss, params)) == decode(got)


def test_pallas_indel_heavy_reads(monkeypatch):
    """Insertion/deletion-rich reads shift band offsets between rows —
    the window-realignment (dynamic roll) path must stay exact."""
    rng = np.random.default_rng(5)
    true = synthdata.make_genome(300, seed=91)
    reads = []
    for _ in range(6):
        r = true
        for _k in range(3):
            p = int(rng.integers(20, len(r) - 20))
            if rng.random() < 0.5:
                r = r[:p] + r[p + int(rng.integers(1, 4)):]
            else:
                ins = "".join("ACGT"[int(x)]
                              for x in rng.integers(0, 4, 3))
                r = r[:p] + ins + r[p:]
        reads.append(encode(r))
    params = PoaParams(band=24, adaptive=True)
    monkeypatch.setenv("MANDO_POA_PALLAS", "interpret")
    got = poa_consensus_batch([reads], params)
    monkeypatch.setenv("MANDO_POA_PALLAS", "0")
    want = poa_consensus_batch([reads], params)
    assert decode(got[0]) == decode(want[0])


def test_max_back_distance_gate():
    from mandalorion_tpu.poa.kernels import graph_arrays, _pow2_at_least
    from mandalorion_tpu.poa.pallas_kernel import max_back_distance
    g = PoaGraph(encode("ACGTACGTAC"))
    g.add_read(encode("ACGTTCGTAC"), PoaParams())
    order = g.topo_order()
    n_cap = _pow2_at_least(len(order), floor=16)
    _b, preds, _e, _o = graph_arrays(g, n_cap, 4, order)
    back = max_back_distance(preds, len(order))
    # a near-linear graph's predecessors are close by
    assert 1 <= back < 16
    # virtual-source rows (preds_r == 0) must not count
    preds2 = preds.copy()
    preds2[len(order) - 1] = [0, -1, -1, -1]
    assert max_back_distance(preds2, len(order)) <= back
