"""Native C++ vs numpy minimizer equality (bit-identical contract)."""

import numpy as np
import pytest

import synthdata
from mandalorion_tpu.align.encode import _minimizers_numpy, encode
from mandalorion_tpu.native import load_native, native_minimizers

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="no native toolchain")


@pytest.mark.parametrize("seed,length", [(1, 500), (2, 5000), (3, 64)])
def test_native_matches_numpy(seed, length):
    codes = encode(synthdata.make_genome(length, seed=seed))
    p1, h1 = _minimizers_numpy(codes, 15, 5)
    p2, h2 = native_minimizers(codes, 15, 5)
    assert np.array_equal(p1, p2)
    assert np.array_equal(h1, h2)


def test_native_with_n_bases():
    seq = synthdata.make_genome(400, seed=4)
    seq = seq[:100] + "N" * 5 + seq[105:300] + "N" + seq[301:]
    codes = encode(seq)
    p1, h1 = _minimizers_numpy(codes, 15, 5)
    p2, h2 = native_minimizers(codes, 15, 5)
    assert np.array_equal(p1, p2)
    assert np.array_equal(h1, h2)


def test_native_short_and_empty():
    for seq in ["", "ACG", "ACGTACGTACGTACG", "ACGTACGTACGTACGT"]:
        codes = encode(seq)
        p1, h1 = _minimizers_numpy(codes, 15, 5)
        p2, h2 = native_minimizers(codes, 15, 5)
        assert np.array_equal(p1, p2) and np.array_equal(h1, h2), seq


def test_encode_seq_native():
    lib = load_native()
    seq = b"ACGTNacgtnX"
    out = np.empty(len(seq), np.uint8)
    lib.encode_seq(seq, len(seq), out.ctypes.data)
    assert list(out) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4]

def _ref_seeded(idx, codes, max_occ):
    from mandalorion_tpu.align.chain import collapse_anchors
    from mandalorion_tpu.align.encode import minimizers
    pos, hashes = minimizers(codes, idx.kmer, idx.window)
    if len(pos) == 0:
        return []
    qidx, gpos = idx.lookup(hashes, max_occ)
    if len(qidx) == 0:
        return []
    ci, _ = idx.position_to_chrom(gpos)
    qpos = pos[qidx]
    return [(int(c), collapse_anchors(qpos[ci == c], gpos[ci == c],
                                      idx.kmer)) for c in np.unique(ci)]


def _seg_tuples(segs):
    return [(s.q_start, s.q_end, s.t_start, s.t_end, s.n_anchors)
            for s in segs]


@pytest.mark.parametrize("force_i64", [False, True])
def test_seed_segments_matches_numpy_path(force_i64):
    """Fused C++ seeding == minimizers->lookup->collapse_anchors,
    bit-identical, across chromosomes and both position dtypes."""
    from mandalorion_tpu.align.index import build_index

    rng = np.random.default_rng(11 + force_i64)
    genome = {f"chr{i}": synthdata.make_genome(20_000, seed=40 + i)
              for i in range(3)}
    idx = build_index(genome)
    if force_i64:
        idx.sorted_positions = idx.sorted_positions.astype(np.int64)
    for trial in range(30):
        c = f"chr{int(rng.integers(0, 3))}"
        s = int(rng.integers(0, 18_000))
        read, _ = synthdata.mutate_read(genome[c][s:s + 1500], rng, 0.03)
        codes = encode(read)
        got = idx.seed_segments(codes, 20)
        ref = _ref_seeded(idx, codes, 20)
        assert [c for c, _s in got] == [c for c, _s in ref], trial
        for (_c1, s1), (_c2, s2) in zip(got, ref):
            assert _seg_tuples(s1) == _seg_tuples(s2), trial


def test_seed_segments_no_hits_and_empty():
    from mandalorion_tpu.align.index import build_index
    genome = {"chr1": synthdata.make_genome(5000, seed=50)}
    idx = build_index(genome)
    other = synthdata.make_genome(800, seed=999)  # unrelated sequence
    assert idx.seed_segments(encode(""), 20) == []
    seeded = idx.seed_segments(encode(other), 20)
    assert seeded == _ref_seeded(idx, encode(other), 20) or seeded == []


def test_emit_psl_matches_numpy_emission():
    """Native cs/PSL emission is byte-identical to the numpy emission
    (format_psl of full records, noisy spliced reads, both strands)."""
    from mandalorion_tpu.align.aligner import SpliceAligner
    from mandalorion_tpu.config import AlignConfig
    from mandalorion_tpu.io.fastx import revcomp
    from mandalorion_tpu.io.psl import format_psl

    rng = np.random.default_rng(8)
    genome = {"chr1": synthdata.make_genome(40_000, seed=21)}
    exons = [(5000, 5600), (7000, 7400), (9000, 9800)]
    genome["chr1"] = synthdata.plant_introns(genome["chr1"], exons)
    t = synthdata.transcript_seq(genome["chr1"], exons)
    reads = []
    for i in range(24):
        r, _ = synthdata.mutate_read(t if i % 2 == 0 else revcomp(t),
                                     rng, 0.03)
        reads.append((f"r{i}", r))
    al = SpliceAligner(genome, AlignConfig())
    al_np = SpliceAligner(genome, AlignConfig())
    al_np._runs_to_psl = al_np._runs_to_psl_numpy
    got = al.map_batch(reads)
    ref = al_np.map_batch(reads)
    assert len(got) == len(ref) == 24
    for a, b in zip(got, ref):
        assert format_psl(a) == format_psl(b), a.q_name


def test_seed_chain_matches_numpy_chain():
    """Fused C++ seed+chain == seed_segments + chain_segments exactly
    (chains, float32 scores, chromosome choice), incl. junk reads."""
    from mandalorion_tpu.align.aligner import SpliceAligner
    from mandalorion_tpu.align.chain import chain_segments
    from mandalorion_tpu.config import AlignConfig
    from mandalorion_tpu.io.fastx import revcomp

    rng = np.random.default_rng(9)
    genome = {f"chr{i}": synthdata.make_genome(30_000, seed=60 + i)
              for i in range(2)}
    exons = [(5000, 5600), (7000, 7400), (9000, 9800)]
    genome["chr0"] = synthdata.plant_introns(genome["chr0"], exons)
    t = synthdata.transcript_seq(genome["chr0"], exons)
    al = SpliceAligner(genome, AlignConfig())
    cfg = al.cfg
    for trial in range(40):
        kind = trial % 4
        if kind == 0:
            r, _ = synthdata.mutate_read(t, rng, 0.05)
        elif kind == 1:
            r, _ = synthdata.mutate_read(revcomp(t), rng, 0.05)
        elif kind == 2:
            s = int(rng.integers(0, 25000))
            r, _ = synthdata.mutate_read(genome["chr1"][s:s + 1200],
                                         rng, 0.05)
        else:
            r = synthdata.make_genome(600, seed=900 + trial)
        codes = encode(r)
        got = al._chain_for(codes)
        best = (None, 0.0, -1)
        for c, segs in (al.index.seed_segments(codes, cfg.max_occ) or []):
            chain, score = chain_segments(
                segs, min_intron=cfg.min_intron, max_intron=cfg.max_intron)
            if chain and score > best[1]:
                best = (chain, score, int(c))
        to_t = lambda ch: [] if ch is None else [
            (s.q_start, s.q_end, s.t_start, s.t_end) for s in ch]
        assert to_t(got[0]) == to_t(best[0]), trial
        assert got[1] == best[1] and got[2] == best[2], trial


def test_parse_cs_matches_numpy():
    """Native cs tokenizer == numpy build_cs_index on fuzzed token
    streams (records, genome positions, intron motifs)."""
    import random

    from mandalorion_tpu.core.csparse import (
        _build_cs_index_numpy, build_cs_index)

    random.seed(5)
    BASES = "ACGT"

    def rand_cs():
        parts = []
        for _ in range(random.randint(1, 40)):
            t = random.choice("=+-*~")
            if t == "=":
                parts.append("=" + "".join(
                    random.choices(BASES, k=random.randint(1, 30))))
            elif t in "+-":
                parts.append(t + "".join(
                    random.choices(BASES.lower(), k=random.randint(1, 5))))
            elif t == "*":
                parts.append("*" + random.choice(BASES.lower())
                             + random.choice(BASES.lower()))
            else:
                parts.append("~" + random.choice(["gt", "ct"])
                             + str(random.randint(10, 99999))
                             + random.choice(["ag", "ac"]))
        return "".join(parts)

    cases = [rand_cs() for _ in range(60)]
    cases += ["", "=A", "~gt100ag", "xx=ACGT", "*ac*gt*aa"]
    for cs in cases:
        a = build_cs_index(cs, 7)
        b = _build_cs_index_numpy(cs, 7)
        assert np.array_equal(a.status, b.status), cs
        assert np.array_equal(a.gp, b.gp), cs
        assert np.array_equal(a.advances, b.advances), cs
        assert a.introns == b.introns, cs


def _numpy_index(genome, k=15, w=5, chunk=1 << 24):
    from mandalorion_tpu.align import index as I
    from mandalorion_tpu.align.encode import encode

    names = sorted(genome)
    parts, offs, szs = [], [], []
    off = 0
    for nm in names:
        cd = encode(genome[nm])
        offs.append(off)
        szs.append(len(cd))
        parts.append(cd)
        parts.append(np.full(1, 4, np.uint8))
        off += len(cd) + 1
    return I._build_index_numpy(
        np.concatenate(parts), names, np.asarray(offs, np.int64),
        np.asarray(szs, np.int64), k, w, chunk)


def test_index_build_matches_numpy():
    rng = np.random.default_rng(11)
    genome = {}
    for c in range(4):
        n = int(rng.integers(300, 60_001))
        genome[f"chr{c + 1}"] = "".join(
            rng.choice(list("ACGTN"), p=[.24, .24, .24, .24, .04], size=n))
    from mandalorion_tpu.align.index import build_index
    a = build_index(genome, chunk=1 << 13)  # small chunks hit boundaries
    b = _numpy_index(genome, chunk=1 << 13)
    assert np.array_equal(a.sorted_hashes, b.sorted_hashes)
    assert np.array_equal(a.sorted_positions, b.sorted_positions)
    assert a.sorted_positions.dtype == b.sorted_positions.dtype
    assert np.array_equal(a.bucket_lo, b.bucket_lo)


def test_index_cache_roundtrip(tmp_path):
    from mandalorion_tpu.align.index import build_index, cached_index
    genome = {"chrA": synthdata.make_genome(30_000, seed=6),
              "chrB": synthdata.make_genome(7_000, seed=7)}
    cache = str(tmp_path / "genome.idx.npz")
    a = cached_index(genome, 15, 5, cache)          # builds + saves
    assert np.load(cache, allow_pickle=True) is not None
    b = cached_index(genome, 15, 5, cache)          # loads
    fresh = build_index(genome)
    for idx in (a, b):
        assert np.array_equal(idx.sorted_hashes, fresh.sorted_hashes)
        assert np.array_equal(idx.sorted_positions, fresh.sorted_positions)
        assert np.array_equal(idx.bucket_lo, fresh.bucket_lo)
        assert np.array_equal(idx.seq_codes, fresh.seq_codes)
        assert idx.chrom_names == fresh.chrom_names
    # mismatched k invalidates the cache (rebuild, not reuse)
    c = cached_index(genome, 13, 5, cache)
    assert c.kmer == 13


def test_fused_align_read_matches_staged_path():
    """align_read_c (one-call seed+chain+fill+DP+emit) == the staged
    Python path, field-for-field including cs strings."""
    from mandalorion_tpu.align.aligner import SpliceAligner
    from mandalorion_tpu.config import AlignConfig
    from mandalorion_tpu.io.fastx import revcomp

    rng = np.random.default_rng(8)
    genome = synthdata.make_genome(400_000, seed=9)
    reads = []
    for g in range(4):
        base = g * 90_000 + 5000
        exons = []
        pos = base
        for _ in range(int(rng.integers(2, 5))):
            ln = int(rng.integers(120, 900))
            exons.append((pos, pos + ln))
            pos += ln + int(rng.integers(100, 20_000))
        strand = "+" if g % 2 == 0 else "-"
        genome = synthdata.plant_introns(genome, exons, strand=strand)
        t = synthdata.transcript_seq(genome, exons)
        if strand == "-":
            t = revcomp(t)
        for ri in range(25):
            reads.append((f"g{g}r{ri}",
                          synthdata.mutate_read(t, rng, 0.03)[0]))
    al = SpliceAligner({"chr1": genome}, AlignConfig())
    fused = al.map_batch(reads)
    orig = SpliceAligner._map_batch_native
    SpliceAligner._map_batch_native = lambda self, r: None
    try:
        staged = al.map_batch(reads)
    finally:
        SpliceAligner._map_batch_native = orig
    assert len(fused) == len(staged) > 0
    for a, b in zip(fused, staged):
        assert a == b, (a.q_name, a.cs[:80], b.cs[:80])


def test_anchor_budget_parity_tandem_repeat():
    """The per-read ANCHOR_BUDGET mid-occ seed-dropping heuristic applies
    identically in the native fused seeding and the numpy fallback
    (GenomeIndex.lookup): a tandem-repeat read whose hits exceed the
    budget yields bit-identical segments on both paths."""
    from mandalorion_tpu.align.index import ANCHOR_BUDGET, build_index

    # 200 copies of a 300 nt unit: a 2-unit read carries ~200 minimizers
    # with ~200 occurrences each (~40k hits > 16384 budget)
    unit = synthdata.make_genome(300, seed=77)
    genome = {"chr1": synthdata.make_genome(50_000, seed=78) + unit * 200}
    idx = build_index(genome)
    read = unit * 2
    codes = encode(read)

    # confirm the scenario actually exceeds the budget under this max_occ
    from mandalorion_tpu.align.encode import minimizers as _mins
    _pos, hashes = _mins(codes, idx.kmer, idx.window)
    lo = np.searchsorted(idx.sorted_hashes, hashes, side="left")
    hi = np.searchsorted(idx.sorted_hashes, hashes, side="right")
    counts = hi - lo
    max_occ = 500
    assert int(counts[(counts > 0) & (counts <= max_occ)].sum()) \
        > ANCHOR_BUDGET

    got = idx.seed_segments(codes, max_occ)
    ref = _ref_seeded(idx, codes, max_occ)
    assert got is not None and ref
    assert [c for c, _s in got] == [c for c, _s in ref]
    for (_c1, s1), (_c2, s2) in zip(got, ref):
        assert _seg_tuples(s1) == _seg_tuples(s2)


def test_index_cache_content_checksum(tmp_path):
    """Same-shape genome edits (a SNP) invalidate the cache: the stale
    index must be rebuilt, not silently reused."""
    from mandalorion_tpu.align.index import cached_index

    g = synthdata.make_genome(30_000, seed=91)
    cache = str(tmp_path / "genome.idx.npz")
    a = cached_index({"chr1": g}, 15, 5, cache)
    # flip one base without changing the length
    pos = 12_345
    flip = {"A": "C", "C": "G", "G": "T", "T": "A"}[g[pos]]
    g2 = g[:pos] + flip + g[pos + 1:]
    b = cached_index({"chr1": g2}, 15, 5, cache)
    assert b.seq_codes[pos] == encode(flip)[0]  # rebuilt against g2
    assert not np.array_equal(a.seq_codes, b.seq_codes)
    # and the refreshed cache now validates against g2
    c = cached_index({"chr1": g2}, 15, 5, cache)
    assert np.array_equal(b.sorted_hashes, c.sorted_hashes)


def test_index_cache_directory_mmap(tmp_path):
    """Non-.npz cache paths persist as a directory of raw .npy files that
    load memory-mapped (hg38-scale indexes page in lazily)."""
    from mandalorion_tpu.align.index import build_index, cached_index

    genome = {"c1": synthdata.make_genome(25_000, seed=13),
              "c2": synthdata.make_genome(6_000, seed=14)}
    cache = str(tmp_path / "genome.idx")
    a = cached_index(genome, 15, 5, cache)
    b = cached_index(genome, 15, 5, cache)
    assert isinstance(b.sorted_hashes, np.memmap)
    fresh = build_index(genome)
    for name in ("sorted_hashes", "sorted_positions", "seq_codes",
                 "bucket_lo", "chrom_offsets", "chrom_sizes"):
        assert np.array_equal(getattr(b, name), getattr(fresh, name)), name
    assert b.chrom_names == fresh.chrom_names and b.kmer == 15
