"""Device chaining kernel vs numpy chain: identical chains and scores on
random segment sets (spliced, indel, overlapping, noisy)."""

import numpy as np
import pytest

from mandalorion_tpu.align.chain import Segment, chain_segments
from mandalorion_tpu.align.chain_kernel import chain_batch_jax


def _random_segments(rng):
    segs = []
    q = int(rng.integers(0, 30))
    t = int(rng.integers(0, 5000))
    for _ in range(int(rng.integers(1, 12))):
        ln = int(rng.integers(15, 300))
        segs.append(Segment(q, q + ln, t, t + ln, n_anchors=3))
        q += ln + int(rng.integers(0, 20))
        t += ln + int(rng.choice([0, 5, 40, 300, 5000, 60000]))
    # sprinkle noise: single-anchor segments both near (survive the
    # prefilter) and far (dropped) — exercises the shared prepare path
    for _ in range(int(rng.integers(0, 8))):
        ln = 15
        nq = int(rng.integers(0, max(q, 1)))
        far = int(rng.choice([0, 10_000_000]))
        s = Segment(nq, nq + ln, nq + far + int(rng.integers(0, 60000)), 0,
                    n_anchors=1)
        s.t_end = s.t_start + ln
        segs.append(s)
    return segs


def test_chain_kernel_matches_numpy():
    rng = np.random.default_rng(17)
    batches = [_random_segments(rng) for _ in range(40)]
    got = chain_batch_jax(batches, min_intron=30, max_intron=400000)
    for segs, (chain_j, score_j) in zip(batches, got):
        chain_n, score_n = chain_segments(segs, min_intron=30,
                                          max_intron=400000)
        assert score_j == pytest.approx(score_n)
        assert [(c.q_start, c.q_end, c.t_start, c.t_end)
                for c in chain_j] == \
               [(c.q_start, c.q_end, c.t_start, c.t_end)
                for c in chain_n]


def test_chain_kernel_empty_and_single():
    got = chain_batch_jax([[], [Segment(0, 100, 500, 600)]],
                          min_intron=30, max_intron=400000)
    assert got[0] == ([], 0.0)
    chain, score = got[1]
    assert len(chain) == 1 and score == 100.0


def test_device_chain_backend_matches_native_map_batch():
    """AlignConfig(chain_backend='device'): seeding on host, all chain
    DPs in one jitted batch — alignments equal the native path's."""
    import synthdata
    from mandalorion_tpu.align.aligner import SpliceAligner
    from mandalorion_tpu.config import AlignConfig
    from mandalorion_tpu.io.fastx import revcomp

    rng = np.random.default_rng(13)
    genome = synthdata.make_genome(300_000, seed=3)
    reads = []
    for g in range(3):
        base = g * 90_000 + 5000
        exons = []
        pos = base
        for _ in range(int(rng.integers(2, 5))):
            ln = int(rng.integers(150, 800))
            exons.append((pos, pos + ln))
            pos += ln + int(rng.integers(100, 15_000))
        strand = "+" if g % 2 == 0 else "-"
        genome = synthdata.plant_introns(genome, exons, strand=strand)
        t = synthdata.transcript_seq(genome, exons)
        if strand == "-":
            t = revcomp(t)
        for ri in range(15):
            reads.append((f"g{g}r{ri}",
                          synthdata.mutate_read(t, rng, 0.03)[0]))
    ref = SpliceAligner({"chr1": genome}, AlignConfig()).map_batch(reads)
    dev = SpliceAligner({"chr1": genome},
                        AlignConfig(chain_backend="device")
                        ).map_batch(reads)
    assert len(ref) == len(dev) > 0
    for a, b in zip(ref, dev):
        assert a == b, a.q_name


def test_device_chain_backend_map_batch_runs():
    """map_batch_runs honors chain_backend='device' (ADVICE r1): the
    runs-interface output matches the native-chain path's runs."""
    import synthdata
    from mandalorion_tpu.align.aligner import SpliceAligner
    from mandalorion_tpu.config import AlignConfig

    rng = np.random.default_rng(21)
    genome = synthdata.make_genome(120_000, seed=9)
    exons = [(4000, 4600), (9000, 9500), (15_000, 15_700)]
    genome = synthdata.plant_introns(genome, exons, strand="+")
    t = synthdata.transcript_seq(genome, exons)
    reads = [(f"r{i}", synthdata.mutate_read(t, rng, 0.02)[0])
             for i in range(10)]
    ref = SpliceAligner({"chr1": genome},
                        AlignConfig()).map_batch_runs(reads)
    dev = SpliceAligner({"chr1": genome},
                        AlignConfig(chain_backend="device")
                        ).map_batch_runs(reads)
    assert len(ref) == len(dev) > 0
    for (n1, s1, q1, runs1), (n2, s2, q2, runs2) in zip(ref, dev):
        assert (n1, s1) == (n2, s2)
        assert np.array_equal(q1, q2)
        assert runs1 == runs2
