"""Star consensus tests: exact recovery from noisy reads, indel majority
handling, agreement with the graph-POA engine on common cases."""

import numpy as np
import pytest

import synthdata
from mandalorion_tpu.align.encode import encode
from mandalorion_tpu.io.fastx import revcomp
from mandalorion_tpu.poa.consensus import determine_consensus
from mandalorion_tpu.poa.star import star_consensus
from mandalorion_tpu.config import PoaConfig


def test_identical_reads():
    seq = synthdata.make_genome(500, seed=1)
    assert star_consensus([seq] * 6) == seq


def test_noisy_substitutions():
    rng = np.random.default_rng(2)
    true = synthdata.make_genome(800, seed=3)
    reads = [true]
    for _ in range(9):
        r, _ = synthdata.mutate_read(true, rng, 0.02)
        reads.append(r)
    assert star_consensus(reads) == true


def test_noisy_backbone_corrected():
    # the backbone itself carries errors; votes from the others fix them
    rng = np.random.default_rng(4)
    true = synthdata.make_genome(600, seed=5)
    backbone, nsubs = synthdata.mutate_read(true, rng, 0.02)
    assert nsubs > 0
    reads = [backbone] + [true] * 7
    assert star_consensus(reads) == true


def test_indels_corrected():
    rng = np.random.default_rng(6)
    true = synthdata.make_genome(700, seed=7)
    reads = [true]
    for i in range(8):
        p = int(rng.integers(50, 650))
        if i % 2:
            r = true[:p] + true[p + 1:]        # deletion error
        else:
            r = true[:p] + "G" + true[p:]      # insertion error
        reads.append(r)
    assert star_consensus(reads) == true


def test_majority_deletion_kept():
    true = synthdata.make_genome(400, seed=8)
    deleted = true[:200] + true[203:]
    # majority carries the deletion -> consensus keeps it
    reads = [true] + [deleted] * 6
    assert star_consensus(reads) == deleted


def test_majority_insertion_kept():
    true = synthdata.make_genome(400, seed=9)
    inserted = true[:200] + "TT" + true[200:]
    reads = [true] + [inserted] * 6
    assert star_consensus(reads) == inserted


def test_determine_consensus_star_engine():
    rng = np.random.default_rng(10)
    true = synthdata.make_genome(500, seed=11)
    reads = []
    for i in range(10):
        r, _ = synthdata.mutate_read(true, rng, 0.02)
        if i % 3 == 1:
            r = revcomp(r)
        reads.append((f"r{i}", r))
    cons, names = determine_consensus(reads, PoaConfig(engine="star"))
    assert cons == true
    assert len(names) == 10


def test_star_matches_graph_engine():
    rng = np.random.default_rng(12)
    true = synthdata.make_genome(300, seed=13)
    reads = []
    for i in range(8):
        r, _ = synthdata.mutate_read(true, rng, 0.01)
        reads.append((f"r{i}", r))
    star, _ = determine_consensus(reads, PoaConfig(engine="star"))
    graph, _ = determine_consensus(reads, PoaConfig(engine="graph"))
    assert star == graph == true


def test_backbone_tail_error_corrected():
    """A backbone error in the last 3 bases must not survive: without the
    extension end-bonus, other reads' alignments stop before the error and
    only the backbone votes there (regression test)."""
    true = synthdata.make_genome(800, seed=21)
    bad_tail = true[:-3] + ("T" if true[-3] != "T" else "G") + true[-2:]
    reads = [bad_tail] + [true] * 9
    assert star_consensus(reads) == true
    # and symmetrically at the start
    bad_head = ("C" if true[2] != "C" else "A").join([true[:2], true[3:]])
    reads = [bad_head] + [true] * 9
    assert star_consensus(reads) == true


def test_fused_runs_path_matches_staged():
    """map_batch_runs' one-call native path == the staged path (names,
    strands, oriented codes, run tuples), under the star config."""
    from mandalorion_tpu.align.aligner import SpliceAligner
    from mandalorion_tpu.io.fastx import revcomp
    from mandalorion_tpu.poa.star import _star_align_cfg

    rng = np.random.default_rng(17)
    bb = synthdata.make_genome(1200, seed=5)
    reads = [("0", bb)]
    for i in range(1, 25):
        r, _ = synthdata.mutate_read(bb, rng, 0.04)
        reads.append((str(i), revcomp(r) if i % 3 == 0 else r))
    al = SpliceAligner({"bb": bb}, _star_align_cfg())
    fused = al.map_batch_runs(reads)
    orig = SpliceAligner._map_batch_runs_native
    SpliceAligner._map_batch_runs_native = lambda self, r: None
    try:
        staged = al.map_batch_runs(reads)
    finally:
        SpliceAligner._map_batch_runs_native = orig
    assert len(fused) == len(staged) > 0
    for (n1, s1, q1, r1), (n2, s2, q2, r2) in zip(fused, staged):
        assert (n1, s1, r1) == (n2, s2, r2)
        assert np.array_equal(q1, q2)
