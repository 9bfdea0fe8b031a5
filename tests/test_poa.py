"""POA graph and consensus tests: exact recovery of a true sequence from
noisy copies, orientation handling, reference fallback behaviors."""

import numpy as np
import pytest

import synthdata
from mandalorion_tpu.align.encode import encode
from mandalorion_tpu.io.fastx import revcomp
from mandalorion_tpu.poa import PoaGraph, determine_consensus, poa_consensus
from mandalorion_tpu.poa.graph import PoaParams


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
