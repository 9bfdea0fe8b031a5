"""Orientation-probe backend parity: the native fast path in
OrientationAligner.strand (one fused C++ seed+chain2 call) must agree
with the numpy scorer pair (strand_numpy) on every read — same seeding
filter (max_occ=16), merge gap, chain arithmetic, and forward-wins-ties
rule. Replaces the reference's mappy map-ont strand probe
(SpliceDefineConsensus.py:895-907)."""

import numpy as np
import pytest

import synthdata
from mandalorion_tpu.align.pairwise import OrientationAligner
from mandalorion_tpu.io.fastx import revcomp
from mandalorion_tpu.native import load_native


@pytest.mark.skipif(load_native() is None, reason="native library needed")
def test_native_strand_matches_numpy():
    rng = np.random.default_rng(7)
    checked = 0
    for trial in range(12):
        true = synthdata.make_genome(int(rng.integers(200, 3000)),
                                     seed=500 + trial)
        al = OrientationAligner(true)
        for _ in range(15):
            seq, _ = synthdata.mutate_read(true, rng, 0.08)
            if rng.random() < 0.5:
                seq = revcomp(seq)
            assert al.strand(seq) == al.strand_numpy(seq)
            checked += 1
    assert checked == 180


@pytest.mark.skipif(load_native() is None, reason="native library needed")
def test_native_strand_edge_cases():
    al = OrientationAligner("ACGTACGTACGTACGTACGTACGTACGT")
    # unrelated low-complexity query: no chain either way on both paths
    assert al.strand("A" * 50) == al.strand_numpy("A" * 50)
    # query shorter than k
    assert al.strand("ACGT") == al.strand_numpy("ACGT")


def test_strand_orients_revcomp():
    true = synthdata.make_genome(1500, seed=42)
    al = OrientationAligner(true)
    assert al.strand(true) == 1
    assert al.strand(revcomp(true)) == -1
