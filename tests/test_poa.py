"""POA graph and consensus tests: exact recovery of a true sequence from
noisy copies, orientation handling, reference fallback behaviors."""

import numpy as np
import pytest

import synthdata
from mandalorion_tpu.align.encode import encode
from mandalorion_tpu.io.fastx import revcomp
from mandalorion_tpu.poa import PoaGraph, determine_consensus
from mandalorion_tpu.poa.graph import PoaParams, poa_consensus


def _decode(codes):
    return "".join("ACGTN"[c] for c in codes)


def test_identical_reads():
    seq = "ACGTTGCAACGGTT"
    cons = poa_consensus([encode(seq)] * 5)
    assert _decode(cons) == seq


def test_majority_substitution():
    true = "ACGTTGCAACGGTTACGTACGT"
    variant = true[:10] + "T" + true[11:]
    # 4 true, 2 variant -> majority wins
    cons = poa_consensus([encode(true)] * 4 + [encode(variant)] * 2)
    assert _decode(cons) == true
    # variant majority wins the other way
    cons2 = poa_consensus([encode(variant)] * 4 + [encode(true)] * 2)
    assert _decode(cons2) == variant


def test_indel_errors_corrected():
    rng = np.random.default_rng(3)
    true = synthdata.make_genome(300, seed=5)
    reads = []
    for i in range(7):
        # each read gets one random deletion and one substitution
        p = int(rng.integers(10, 290))
        r = true[:p] + true[p + 1:]
        r, _ = synthdata.mutate_read(r, rng, 0.01)
        reads.append(encode(r))
    cons = _decode(poa_consensus([encode(true)] + reads))
    assert cons == true


def test_insertion_errors_corrected():
    rng = np.random.default_rng(4)
    true = synthdata.make_genome(250, seed=6)
    reads = [encode(true)]
    for i in range(6):
        p = int(rng.integers(10, 240))
        r = true[:p] + "A" + true[p:]
        reads.append(encode(r))
    # insertion shared by most reads at same spot -> kept; noise -> dropped
    cons = _decode(poa_consensus(reads))
    expect = true[:rng.integers(0, 1)]  # just check lengths class
    assert abs(len(cons) - len(true)) <= 1


def test_determine_consensus_orientation():
    true = synthdata.make_genome(400, seed=8)
    reads = [("r1", true), ("r2", revcomp(true)), ("r3", true),
             ("r4", revcomp(true)), ("r5", true)]
    cons, names = determine_consensus(reads)
    assert names == ["r1", "r2", "r3", "r4", "r5"]
    assert cons == true


def test_determine_consensus_two_reads():
    true = synthdata.make_genome(300, seed=9)
    other = synthdata.make_genome(300, seed=10)
    cons, names = determine_consensus([("a", true), ("b", other)])
    # <=2 oriented reads -> first sequence (reference behavior SDC.py:911)
    assert cons == true
    assert names == ["a", "b"]


def test_consensus_noisy_isoform():
    rng = np.random.default_rng(11)
    true = synthdata.make_genome(600, seed=12)
    reads = []
    for i in range(12):
        r, _ = synthdata.mutate_read(true, rng, 0.02)
        if i % 2:
            r = revcomp(r)
        reads.append((f"n{i}", r))
    cons, names = determine_consensus(reads)
    assert len(names) == 12
    # consensus should be (near-)perfect despite 2% read error
    assert cons == true


# --------------------------------------------------- batched TPU kernel

def _mutate(rng, base, err):
    out = []
    for b in base:
        u = rng.random()
        if u < err / 3:
            continue
        if u < 2 * err / 3:
            out.extend([b, rng.integers(0, 4)])
        elif u < err:
            out.append(rng.integers(0, 4))
        else:
            out.append(b)
    return np.array(out, np.uint8)


def _rand_sets(rng, n_sets, reads_lo=3, reads_hi=9, len_lo=60, len_hi=400):
    sets = []
    for _ in range(n_sets):
        base = rng.integers(0, 4, int(rng.integers(len_lo, len_hi)))
        base = base.astype(np.uint8)
        sets.append([base.copy()] + [
            _mutate(rng, base, 0.04)
            for _ in range(int(rng.integers(reads_lo, reads_hi)))])
    return sets


def test_kernel_paths_match_python_engine():
    """Per-read device DP+traceback == PoaGraph.align, bit-identical."""
    from mandalorion_tpu.poa.graph import PoaGraph, PoaParams
    from mandalorion_tpu.poa.kernels import align_graph_batch
    rng = np.random.default_rng(42)
    params = PoaParams()
    for reads in _rand_sets(rng, 3):
        g_py, g_k = PoaGraph(reads[0]), PoaGraph(reads[0])
        for q in reads[1:]:
            p_py = g_py.align(q, params)
            p_k = align_graph_batch([g_k], [q], params)[0]
            assert p_py == p_k
            g_py.apply_path(q, p_py)
            g_k.apply_path(q, p_k)
        assert np.array_equal(g_py.consensus(), g_k.consensus())


def test_kernel_matches_python_adaptive_band():
    """Adaptive (-S) mode: device DP+traceback == PoaGraph.align per read,
    bit-identical, including the best_col band-center bookkeeping."""
    from mandalorion_tpu.poa.graph import PoaGraph, PoaParams
    from mandalorion_tpu.poa.kernels import align_graph_batch
    rng = np.random.default_rng(11)
    params = PoaParams(band=24, adaptive=True)
    for reads in _rand_sets(rng, 3, len_lo=200, len_hi=700):
        g_py, g_k = PoaGraph(reads[0]), PoaGraph(reads[0])
        for q in reads[1:]:
            p_py = g_py.align(q, params)
            p_k = align_graph_batch([g_k], [q], params)[0]
            assert p_py == p_k
            g_py.apply_path(q, p_py)
            g_k.apply_path(q, p_k)
        assert np.array_equal(g_py.consensus(), g_k.consensus())


def test_native_matches_python_engine():
    """C++ banded engine == PoaGraph, bit-identical: per-read paths AND
    one-shot consensi, static and adaptive bands (three-way with the
    kernel via test_kernel_paths_match_python_engine)."""
    import pytest
    from mandalorion_tpu.native import (load_native, native_poa_align,
                                        native_poa_consensus)
    from mandalorion_tpu.poa.graph import PoaGraph, PoaParams, poa_consensus
    if load_native() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(17)
    for adaptive in (False, True):
        params = PoaParams(band=24, adaptive=adaptive)
        for reads in _rand_sets(rng, 3):
            g = PoaGraph(reads[0])
            for q in reads[1:]:
                p_py = g.align(q, params)
                p_c = native_poa_align(g, q, params)
                assert p_py == p_c
                g.apply_path(q, p_py)
            c_py = poa_consensus(reads, params)
            c_c = native_poa_consensus(reads, params)
            assert np.array_equal(c_py, c_c)


def test_resolve_jobs_native_matches_device():
    """resolve_consensus_jobs produces identical consensi through the
    native backend and the batched device kernel backend."""
    import pytest
    from mandalorion_tpu.align.encode import decode
    from mandalorion_tpu.config import PoaConfig
    from mandalorion_tpu.native import load_native
    from mandalorion_tpu.poa.consensus import (prepare_consensus_jobs,
                                               resolve_consensus_jobs)
    if load_native() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(23)
    read_sets = [[(f"s{i}_r{k}", decode(s))
                  for k, s in enumerate(reads)]
                 for i, reads in enumerate(_rand_sets(rng, 4))]
    cfg = PoaConfig(engine="graph")
    out_n = resolve_consensus_jobs(
        prepare_consensus_jobs(read_sets, cfg), backend="native")
    out_d = resolve_consensus_jobs(
        prepare_consensus_jobs(read_sets, cfg), backend="device")
    assert out_n == out_d


def test_adaptive_band_long_isoform_consensus_exact():
    """The -S regime end to end in the engine: a 9 kb isoform (above the
    8000 adaptive threshold), 7 noisy reads — the adaptive-band graph
    consensus reproduces the true sequence exactly (identity, not just
    length), with no star fallback involved."""
    from mandalorion_tpu.align.encode import decode
    from mandalorion_tpu.config import PoaConfig
    from mandalorion_tpu.poa.consensus import determine_consensus
    rng = np.random.default_rng(5)
    base = rng.integers(0, 4, 9000).astype(np.uint8)
    reads = [("r0", decode(base))] + [
        (f"r{k}", decode(_mutate(rng, base, 0.02))) for k in range(1, 7)]
    cfg = PoaConfig(engine="graph")
    cons, names = determine_consensus(reads, cfg)
    assert len(names) == 7
    assert cons == decode(base)


def test_batch_consensus_matches_sequential():
    from mandalorion_tpu.poa.graph import PoaParams, poa_consensus
    from mandalorion_tpu.poa.kernels import poa_consensus_batch
    rng = np.random.default_rng(7)
    sets = _rand_sets(rng, 6)
    params = PoaParams()
    seq = [poa_consensus(s, params) for s in sets]
    bat = poa_consensus_batch(sets, params)
    assert all(np.array_equal(a, b) for a, b in zip(seq, bat))


def test_determine_consensus_batch_graph_engine():
    """Batched graph-engine consensus == per-isoform sequential calls,
    including rng-consumption order and the <=2-read / unoriented / star
    fallback paths."""
    from mandalorion_tpu.align.encode import decode
    from mandalorion_tpu.config import PoaConfig
    from mandalorion_tpu.poa.consensus import (
        determine_consensus, determine_consensus_batch)
    rng = np.random.default_rng(3)
    read_sets = []
    for si, s in enumerate(_rand_sets(rng, 5, reads_lo=2, reads_hi=7)):
        read_sets.append([(f"i{si}r{k}", decode(c))
                          for k, c in enumerate(s)])
    read_sets.append([("lone0", decode(rng.integers(0, 4, 150)
                                       .astype(np.uint8)))])
    cfg = PoaConfig(engine="graph")
    seq = [determine_consensus(rs, cfg, np.random.default_rng(9))
           for rs in read_sets]
    # sequential rng is per-call fresh above; batch consumes one rng in
    # order — replicate by re-running sequentially with a shared rng
    shared = np.random.default_rng(11)
    seq = [determine_consensus(rs, cfg, shared) for rs in read_sets]
    bat = determine_consensus_batch(read_sets, cfg,
                                    np.random.default_rng(11))
    assert seq == bat


# ------------------- convex (dual-affine) gap model, abPOA semantics ------

def _convex_gotoh_score(a, b, p):
    """Brute-force optimal global alignment score of codes a vs b under
    the convex model: gap(k) = min(o1 + k*e1, o2 + k*e2). Independent
    5-state Gotoh oracle (both gap states open from full H)."""
    o1, e1, o2, e2 = p.gap_open, p.gap_extend, p.gap_open2, p.gap_extend2
    NEG = -(10 ** 9)
    la, lb = len(a), len(b)
    H = np.full((la + 1, lb + 1), NEG, np.int64)
    E1 = np.full_like(H, NEG)   # gap in a (consume b)
    E2 = np.full_like(H, NEG)
    F1 = np.full_like(H, NEG)   # gap in b (consume a)
    F2 = np.full_like(H, NEG)
    H[0, 0] = 0
    for i in range(la + 1):
        for j in range(lb + 1):
            if i == 0 and j == 0:
                continue
            if j > 0:
                E1[i, j] = max(H[i, j - 1] - o1 - e1, E1[i, j - 1] - e1)
                E2[i, j] = max(H[i, j - 1] - o2 - e2, E2[i, j - 1] - e2)
            if i > 0:
                F1[i, j] = max(H[i - 1, j] - o1 - e1, F1[i - 1, j] - e1)
                F2[i, j] = max(H[i - 1, j] - o2 - e2, F2[i - 1, j] - e2)
            diag = NEG
            if i > 0 and j > 0:
                diag = H[i - 1, j - 1] + (
                    p.match if a[i - 1] == b[j - 1] else -p.mismatch)
            H[i, j] = max(diag, E1[i, j], E2[i, j], F1[i, j], F2[i, j])
    return int(H[la, lb])


def _path_score(path, backbone, q, p):
    """Score an alignment path under the convex model (contiguous
    insertion/deletion runs cost min over the two components)."""
    def gap_cost(k):
        return min(p.gap_open + k * p.gap_extend,
                   p.gap_open2 + k * p.gap_extend2)

    score = 0
    run_i = run_d = 0
    for qi, node in path:
        if qi == -1:
            if run_i:
                score -= gap_cost(run_i)
                run_i = 0
            run_d += 1
        elif node is None:
            if run_d:
                score -= gap_cost(run_d)
                run_d = 0
            run_i += 1
        else:
            if run_i:
                score -= gap_cost(run_i)
                run_i = 0
            if run_d:
                score -= gap_cost(run_d)
                run_d = 0
            score += (p.match if backbone[node] == q[qi]
                      else -p.mismatch)
    if run_i:
        score -= gap_cost(run_i)
    if run_d:
        score -= gap_cost(run_d)
    return score


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_convex_alignment_is_optimal(seed):
    """PoaGraph.align's convex-affine DP returns paths whose convex-model
    score equals the brute-force Gotoh optimum (random pairs, band off)."""
    rng = np.random.default_rng(seed)
    p = PoaParams(band=10_000)
    for _ in range(8):
        a = rng.integers(0, 4, size=int(rng.integers(10, 60))).astype(
            np.uint8)
        b = list(a)
        for _e in range(int(rng.integers(1, 6))):
            kind = rng.integers(0, 3)
            pos = int(rng.integers(0, max(len(b), 1)))
            if kind == 0 and b:
                b[pos] = int(rng.integers(0, 4))
            elif kind == 1:
                ln = int(rng.integers(1, 40))  # long enough to flip comps
                for _ in range(ln):
                    b.insert(pos, int(rng.integers(0, 4)))
            elif b:
                del b[pos:pos + int(rng.integers(1, min(len(b), 30) + 1))]
        b = np.asarray(b, np.uint8)
        if len(b) == 0:
            continue
        g = PoaGraph(a)
        path = g.align(b, p)
        assert _path_score(path, g.base, b, p) == \
            _convex_gotoh_score(a, b, p), (seed, a, b)


def test_convex_long_gap_uses_cheap_extend_component():
    """abPOA's documented convex scoring: a 30 nt deletion costs
    min(6+30*2, 26+30*1) = 56 via the second component, and the DP keeps
    it as ONE contiguous gap (an affine-only or fragmented model would
    score/shape it differently)."""
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, size=120).astype(np.uint8)
    b = np.concatenate([a[:40], a[70:]])  # 30 nt deletion vs the backbone
    p = PoaParams()
    g = PoaGraph(a)
    path = g.align(b, p)
    score = _path_score(path, g.base, b, p)
    assert score == p.match * len(b) - (p.gap_open2 + 30 * p.gap_extend2)
    # the deletion is one contiguous node-skip run
    runs = []
    cur = 0
    for qi, node in path:
        if qi == -1:
            cur += 1
        elif cur:
            runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    assert runs == [30]


def test_convex_short_gap_uses_cheap_open_component():
    """Short gaps take the cheap-open component: a 3 nt insertion costs
    min(6+3*2, 26+3*1) = 12."""
    rng = np.random.default_rng(6)
    a = rng.integers(0, 4, size=80).astype(np.uint8)
    b = np.concatenate([a[:30],
                        np.array([0, 1, 2], np.uint8) ^ 0,  # inserted
                        a[30:]])
    # make sure the inserted bases aren't accidental matches at the join
    p = PoaParams()
    g = PoaGraph(a)
    path = g.align(b, p)
    score = _path_score(path, g.base, b, p)
    assert score == _convex_gotoh_score(a, b, p)
    assert score >= p.match * 80 - (p.gap_open + 3 * p.gap_extend)


def test_kernel_matches_python_convex_fixtures():
    """The device kernel reproduces the Python engine's convex-affine
    paths on gap-heavy fixtures (long deletions, long insertions)."""
    from mandalorion_tpu.poa.kernels import align_graph_batch

    rng = np.random.default_rng(9)
    p = PoaParams()
    graphs, queries, expect = [], [], []
    for trial in range(6):
        a = rng.integers(0, 4, size=150).astype(np.uint8)
        cut = int(rng.integers(20, 100))
        gap = int(rng.integers(1, 45))
        if trial % 2 == 0:
            b = np.concatenate([a[:cut], a[cut + gap:]])      # deletion
        else:
            ins = rng.integers(0, 4, size=gap).astype(np.uint8)
            b = np.concatenate([a[:cut], ins, a[cut:]])       # insertion
        g = PoaGraph(a)
        expect.append(g.align(b, p))
        graphs.append(g)
        queries.append(b)
    got = align_graph_batch(graphs, queries, p)
    for e, k in zip(expect, got):
        assert e == k
