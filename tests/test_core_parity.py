"""Parity tests: our core algorithms vs the reference's pure functions run
as oracles on the same inputs (SURVEY §4 golden strategy, below all
subsample caps so the reference is deterministic)."""

import os

import numpy as np
import pytest

import oracle
import synthdata
from mandalorion_tpu.config import PipelineConfig
from mandalorion_tpu.core.cleanpsl import clean_psl_file, iter_loci
from mandalorion_tpu.core.ends import define_start_end_sites, find_ends
from mandalorion_tpu.core.peaks import (
    LocusReads, collect_reads, find_peaks, make_genome_bins)
from mandalorion_tpu.core.splices import (
    build_splice_dict, group_mono_exon_transcripts,
    sort_reads_into_splice_junctions)
from mandalorion_tpu.io.psl import parse_psl_line

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference tree not mounted")

CHROM = "chr1"
JUNCTIONS = ("gtag", "gcag", "atac", "ctac", "ctgc", "gtat")


@pytest.fixture(scope="module")
def sdc():
    return oracle.load_sdc()


@pytest.fixture(scope="module")
def locus_data():
    """A synthetic locus: genome + two isoforms' worth of reads (different
    splice patterns + a mono-exon group), error-free, plus truth PSL."""
    genome = synthdata.make_genome(9000, seed=11)
    iso1 = [(1000, 1400), (2000, 2400), (3000, 3600)]
    iso2 = [(1000, 1400), (2600, 3600)]
    genome = synthdata.plant_introns(genome, iso1)
    genome = synthdata.plant_introns(genome, iso2)
    lines = []
    n = 0
    for _ in range(8):
        lines.append(synthdata.truth_psl_line(
            f"readA{n}", genome, iso1, left_extra=2, right_extra=3))
        n += 1
    for _ in range(6):
        lines.append(synthdata.truth_psl_line(
            f"readB{n}", genome, iso2, left_extra=1, right_extra=4))
        n += 1
    for _ in range(4):
        lines.append(synthdata.truth_psl_line(
            f"readM{n}", genome, [(5000, 5900)]))
        n += 1
    return genome, lines


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


# ---------------------------------------------------------------- clean_psl

def test_clean_psl_parity(tmp_path, sdc):
    # blocks with sub-10nt gaps (merged) and big gaps (kept as introns),
    # duplicate read names (primary dedup)
    rows = []
    rng = np.random.default_rng(3)
    for i in range(25):
        nblocks = rng.integers(1, 6)
        t = int(rng.integers(0, 500))
        q = int(rng.integers(0, 30))
        sizes, tstarts, qstarts = [], [], []
        for _ in range(nblocks):
            size = int(rng.integers(5, 120))
            sizes.append(size)
            tstarts.append(t)
            qstarts.append(q)
            q += size + int(rng.integers(0, 4))
            t += size + int(rng.choice([2, 5, 9, 10, 11, 60, 300]))
        name = f"r{i % 20}"  # some duplicate names
        row = (f"{sum(sizes)}\t0\t0\t0\t0\t0\t0\t0\t+\t{name}\t{q + 5}\t"
               f"{qstarts[0]}\t{q}\tchr1\t10000\t{tstarts[0]}\t"
               f"{tstarts[-1] + sizes[-1]}\t{nblocks}\t"
               + ",".join(map(str, sizes)) + ","
               + "\t" + ",".join(map(str, qstarts)) + ","
               + "\t" + ",".join(map(str, tstarts)) + ",")
        rows.append(row + "\n")
    src = _write(tmp_path, "in.psl", "".join(rows))
    ref_out = str(tmp_path / "ref.psl")
    my_out = str(tmp_path / "mine.psl")
    sdc.clean_psl(src, ref_out, True)
    clean_psl_file(src, my_out, True)
    assert open(my_out).read() == open(ref_out).read()


# ------------------------------------------------------------- locus split

def test_locus_split_parity(tmp_path, sdc):
    lines = []
    for chrom, start, end, name in [
        ("chr1", 100, 500, "a"), ("chr1", 400, 900, "b"),
        ("chr1", 901, 1200, "c"), ("chr2", 50, 200, "d"),
        ("chr2", 100, 150, "e"), ("chr2", 300, 400, "f"),
    ]:
        lines.append(
            f"0\t0\t0\t0\t0\t0\t0\t0\t+\t{name}\t100\t0\t100\t{chrom}\t"
            f"10000\t{start}\t{end}\t1\t{end - start},\t0,\t{start},\n")
    src = _write(tmp_path, "sorted.psl", "".join(lines))
    ref_dir = tmp_path / "ref_SS"
    ref_dir.mkdir()
    sdc.get_chromosomes(src, str(ref_dir), [])
    with open(src) as fh:
        mine = {f"{c}~{s}~{e}": [ln.split('\t')[9] for ln in lns]
                for c, s, e, lns in iter_loci(fh)}
    ref = {}
    for f in os.listdir(ref_dir):
        root = f[:-4]
        ref[root] = [ln.split("\t")[9] for ln in open(ref_dir / f)]
    assert mine == ref


# ----------------------------------------------------------- collect_reads

def test_collect_reads_parity(tmp_path, sdc, locus_data):
    genome, lines = locus_data
    src = _write(tmp_path, "locus.psl", "\n".join(lines) + "\n")
    hl, hr, hc, cs = sdc.collect_reads(src, CHROM)
    reads = LocusReads.from_records([parse_psl_line(l) for l in lines])
    hist = collect_reads(reads)

    assert {p: sorted(hist.reads.names[i] for i in v)
            for p, v in hist.left.items.items()} == \
           {p: sorted(x[0] for x in v) for p, v in hl[CHROM].items()}
    assert {p: sorted(hist.reads.names[i] for i in v)
            for p, v in hist.right.items.items()} == \
           {p: sorted(x[0] for x in v) for p, v in hr[CHROM].items()}
    assert hist.cov == hc[CHROM]
    # per-read cov sets match the reference item payloads
    for p, items in hl[CHROM].items():
        ref_sets = {x[0]: x[3] for x in items}
        for i in hist.left.items[p]:
            assert set(map(int, hist.coverage.read_positions(i))) == \
                   ref_sets[hist.reads.names[i]]


# -------------------------------------------------------- make_genome_bins

def test_make_genome_bins_parity(sdc):
    rng = np.random.default_rng(5)
    # clustered positions incl. duplicates and sub-3 gaps
    base = np.sort(rng.integers(0, 3000, size=40))
    bounds5 = sorted(set(base.tolist()) | {100, 101, 102, 500, 502, 505})
    bounds3 = sorted(rng.integers(0, 3000, size=20).tolist())
    bounds = {"5": bounds5, "3": bounds3}

    ref_areas = {CHROM: {"l": {}}}
    ref_rows = sdc.make_genome_bins(
        {k: list(v) for k, v in bounds.items()}, "l", CHROM, ref_areas, 2)[1]
    my_areas = set()
    my_rows = make_genome_bins(bounds, "l", CHROM, my_areas, 2)
    assert my_rows == ref_rows
    assert my_areas == set(ref_areas[CHROM]["l"])


# -------------------------------------------------------------- find_peaks

def _reference_peaks(sdc, tmp_path, lines, cutoff=0.1, w=1, min_count=2):
    src = _write(tmp_path, "locus_ref.psl", "\n".join(lines) + "\n")
    hl, hr, hc, cs = sdc.collect_reads(src, CHROM)
    peak_areas = {CHROM: {"l": {}, "r": {}}}
    pa, rows_l = sdc.find_peaks(
        hl[CHROM], True, cutoff, hc, "l", peak_areas, CHROM, cs, 0, 0, w,
        min_count, list(JUNCTIONS))
    pa, rows_r = sdc.find_peaks(
        hr[CHROM], False, cutoff, hc, "r", pa, CHROM, cs, 0, 0, w,
        min_count, list(JUNCTIONS))
    return rows_l, rows_r


def test_find_peaks_parity(tmp_path, sdc, locus_data):
    genome, lines = locus_data
    ref_l, ref_r = _reference_peaks(sdc, tmp_path, lines)
    reads = LocusReads.from_records([parse_psl_line(l) for l in lines])
    hist = collect_reads(reads)
    areas_l, areas_r = set(), set()
    my_l = find_peaks(hist, "l", CHROM, areas_l, 0.1, 1, 2, JUNCTIONS)
    my_r = find_peaks(hist, "r", CHROM, areas_r, 0.1, 1, 2, JUNCTIONS)
    assert my_l == ref_l
    assert my_r == ref_r
    assert len(my_l) == 2 and len(my_r) == 3  # iso1+iso2 junction edges


# --------------------------------------------------------------- find_ends

@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_find_ends_parity(sdc, seed):
    rng = np.random.default_rng(seed)
    centers = rng.integers(0, 2000, size=4)
    starts, ends = [], []
    for c in centers:
        starts.extend((c + rng.integers(-30, 30, size=12)).tolist())
        ends.extend((c + 800 + rng.integers(-30, 30, size=12)).tolist())
    count_dict = {k: set() for k in
                  ["start_left", "start_right", "end_left", "end_right",
                   "+", "-"]}
    ref_s, ref_e, _ = sdc.find_ends(
        list(starts), list(ends), "id+", count_dict, 10, 50, 2)
    my_s, my_e = find_ends(starts, ends, 10, 50, 2)
    assert my_s == ref_s
    assert my_e == ref_e


# ------------------------------------------- junction sorting and isoforms

def test_junction_grouping_and_isoforms_parity(tmp_path, sdc, locus_data):
    genome, lines = locus_data
    src = _write(tmp_path, "locus2.psl", "\n".join(lines) + "\n")

    # reference flow (defineIsoforms.process_locus up to isoform dict)
    hl, hr, hc, cs = sdc.collect_reads(src, CHROM)
    peak_areas = {CHROM: {"l": {}, "r": {}}}
    pa, rows_l = sdc.find_peaks(hl[CHROM], True, 0.1, hc, "l", peak_areas,
                                CHROM, cs, 0, 0, 1, 2, list(JUNCTIONS))
    pa, rows_r = sdc.find_peaks(hr[CHROM], False, 0.1, hc, "r", pa, CHROM,
                                cs, 0, 0, 1, 2, list(JUNCTIONS))
    peak_counter = {"l": 0, "r": 0}
    splice_ref = {CHROM: {}}
    for rows in [[], [], rows_l, rows_r]:
        for chrom, start, end, type1, side, prop in rows:
            peak_counter[side] += 1
            for base in range(int(start), int(end) + 1):
                splice_ref[CHROM][base] = type1 + side + str(peak_counter[side])
    sed, sed_mono = sdc.sort_reads_into_splice_junctions(splice_ref, src)
    ref_iso = sdc.define_start_end_sites(
        dict(sed), dict(sed_mono), 10, 50, 2)
    ref_groups = {k: sorted(name for name, seq in reads)
                  for k, reads in ref_iso.items()}

    # our flow
    reads = LocusReads.from_records([parse_psl_line(l) for l in lines])
    hist = collect_reads(reads)
    al, ar = set(), set()
    my_l = find_peaks(hist, "l", CHROM, al, 0.1, 1, 2, JUNCTIONS)
    my_r = find_peaks(hist, "r", CHROM, ar, 0.1, 1, 2, JUNCTIONS)
    splice = build_splice_dict([[], [], my_l, my_r])
    spliced, mono = sort_reads_into_splice_junctions(splice, reads, CHROM)
    iso = define_start_end_sites(spliced, mono, reads, 10, 50, 2)
    my_groups = {k: sorted(reads.names[i] for i in g.read_indices)
                 for k, g in iso.items()}
    assert my_groups == ref_groups
    assert len(my_groups) >= 3  # two spliced isoforms + mono group


def test_mono_grouping_parity(sdc):
    sdc_mono = {"chr1_": [
        (100, 200, ("r1", "s"), 0, 0, "+"),
        (150, 400, ("r2", "s"), 0, 0, "+"),
        (500, 600, ("r3", "s"), 0, 0, "+"),
        (550, 560, ("r4", "s"), 0, 0, "+"),
        (565, 580, ("r5", "s"), 0, 0, "+"),
    ]}
    ref = sdc.group_mono_exon_transcripts({}, {k: list(v)
                                               for k, v in sdc_mono.items()})
    ref_groups = {k: [r[0] for _s, _e, r, *_ in v] for k, v in ref.items()}

    from mandalorion_tpu.core.splices import ReadPlacement
    names = ["r1", "r2", "r3", "r4", "r5"]
    reads = LocusReads(
        names=names, dirns=["+"] * 5,
        q_sizes=np.zeros(5, np.int64), q_starts=np.zeros(5, np.int64),
        q_ends=np.zeros(5, np.int64), begins=np.zeros(5, np.int64),
        spans=np.zeros(5, np.int64), accuracies=np.ones(5),
        block_sizes=[np.zeros(0, np.int64)] * 5,
        block_starts=[np.zeros(0, np.int64)] * 5,
        cs_strings=[""] * 5, sequences=[""] * 5)
    mono = {"chr1_": [
        ReadPlacement(100, 200, 0, 0, 0, "+"),
        ReadPlacement(150, 400, 1, 0, 0, "+"),
        ReadPlacement(500, 600, 2, 0, 0, "+"),
        ReadPlacement(550, 560, 3, 0, 0, "+"),
        ReadPlacement(565, 580, 4, 0, 0, "+"),
    ]}
    mine = group_mono_exon_transcripts({}, mono, reads)
    my_groups = {k: [names[p.read_index] for p in v] for k, v in mine.items()}
    assert my_groups == ref_groups


@pytest.mark.parametrize("w,cutoff,min_count", [(2, 0.1, 2), (1, 0.4, 3),
                                                (3, 0.05, 1)])
def test_find_peaks_parity_parameterized(tmp_path, sdc, locus_data,
                                         w, cutoff, min_count):
    """Peak-caller parity across splice windows, cutoffs and feature
    counts (the -w/-c/-n surface)."""
    genome, lines = locus_data
    ref_l, ref_r = _reference_peaks(sdc, tmp_path, lines, cutoff=cutoff,
                                    w=w, min_count=min_count)
    reads = LocusReads.from_records([parse_psl_line(l) for l in lines])
    hist = collect_reads(reads)
    al, ar = set(), set()
    my_l = find_peaks(hist, "l", CHROM, al, cutoff, w, min_count, JUNCTIONS)
    my_r = find_peaks(hist, "r", CHROM, ar, cutoff, w, min_count, JUNCTIONS)
    assert my_l == ref_l
    assert my_r == ref_r


@pytest.mark.parametrize("u,d,n", [(5, 20, 1), (20, 100, 3)])
def test_find_ends_parity_buffers(sdc, u, d, n):
    """End-caller parity across -u/-d/-n settings."""
    rng = np.random.default_rng(9)
    starts, ends = [], []
    for c in rng.integers(0, 3000, size=5):
        starts.extend((c + rng.integers(-40, 40, size=15)).tolist())
        ends.extend((c + 700 + rng.integers(-40, 40, size=15)).tolist())
    count_dict = {k: set() for k in
                  ["start_left", "start_right", "end_left", "end_right",
                   "+", "-"]}
    ref_s, ref_e, _ = sdc.find_ends(list(starts), list(ends), "id",
                                    count_dict, u, d, n)
    my_s, my_e = find_ends(starts, ends, u, d, n)
    assert my_s == ref_s and my_e == ref_e


@pytest.mark.parametrize("seed,sub_rate", [(1, 0.02), (2, 0.05), (3, 0.1)])
def test_find_peaks_parity_noisy_cs(tmp_path, sdc, seed, sub_rate):
    """Peak calling + cs-walk motif/flank gates on reads WITH substitution
    errors: exercises the '*' token paths of getCSaroundSS vs csparse,
    the accuracy gate, and flank-accuracy rejection."""
    rng = np.random.default_rng(seed)
    genome = synthdata.make_genome(9000, seed=40 + seed)
    iso = [(1000, 1500), (2200, 2700), (4000, 4700)]
    genome = synthdata.plant_introns(genome, iso)
    lines = [synthdata.noisy_psl_line(f"n{i}", genome, iso, rng, sub_rate)
             for i in range(12)]
    ref_l, ref_r = _reference_peaks(sdc, tmp_path, lines)
    reads = LocusReads.from_records([parse_psl_line(l) for l in lines])
    hist = collect_reads(reads)
    al, ar = set(), set()
    my_l = find_peaks(hist, "l", CHROM, al, 0.1, 1, 2, JUNCTIONS)
    my_r = find_peaks(hist, "r", CHROM, ar, 0.1, 1, 2, JUNCTIONS)
    assert my_l == ref_l
    assert my_r == ref_r


def test_junction_grouping_parity_noisy(tmp_path, sdc):
    """Full D-core grouping parity on noisy reads (mixed accuracies
    straddling the 0.9 gate)."""
    rng = np.random.default_rng(8)
    genome = synthdata.make_genome(9000, seed=47)
    iso = [(1000, 1500), (2200, 2700)]
    genome = synthdata.plant_introns(genome, iso)
    lines = []
    for i in range(10):
        rate = 0.02 if i % 3 else 0.12  # every third read below the gate
        lines.append(synthdata.noisy_psl_line(f"m{i}", genome, iso, rng,
                                              rate))
    src = _write(tmp_path, "noisy.psl", "\n".join(lines) + "\n")
    hl, hr, hc, cs = sdc.collect_reads(src, CHROM)
    peak_areas = {CHROM: {"l": {}, "r": {}}}
    pa, rows_l = sdc.find_peaks(hl[CHROM], True, 0.1, hc, "l", peak_areas,
                                CHROM, cs, 0, 0, 1, 2, list(JUNCTIONS))
    pa, rows_r = sdc.find_peaks(hr[CHROM], False, 0.1, hc, "r", pa, CHROM,
                                cs, 0, 0, 1, 2, list(JUNCTIONS))
    peak_counter = {"l": 0, "r": 0}
    splice_ref = {CHROM: {}}
    for rows in [[], [], rows_l, rows_r]:
        for chrom, start, end, type1, side, prop in rows:
            peak_counter[side] += 1
            for base in range(int(start), int(end) + 1):
                splice_ref[CHROM][base] = type1 + side + str(peak_counter[side])
    sed, sed_mono = sdc.sort_reads_into_splice_junctions(splice_ref, src)
    ref_iso = sdc.define_start_end_sites(dict(sed), dict(sed_mono), 10, 50, 2)
    ref_groups = {k: sorted(n for n, s in v) for k, v in ref_iso.items()}

    reads = LocusReads.from_records([parse_psl_line(l) for l in lines])
    hist = collect_reads(reads)
    al, ar = set(), set()
    my_l = find_peaks(hist, "l", CHROM, al, 0.1, 1, 2, JUNCTIONS)
    my_r = find_peaks(hist, "r", CHROM, ar, 0.1, 1, 2, JUNCTIONS)
    assert my_l == rows_l and my_r == rows_r
    splice = build_splice_dict([[], [], my_l, my_r])
    sp, mono = sort_reads_into_splice_junctions(splice, reads, CHROM)
    iso_mine = define_start_end_sites(sp, mono, reads, 10, 50, 2)
    my_groups = {k: sorted(reads.names[i] for i in g.read_indices)
                 for k, g in iso_mine.items()}
    assert my_groups == ref_groups


@pytest.mark.filterwarnings("ignore::RuntimeWarning",
                            "ignore::DeprecationWarning")
def test_clean_sort_split_parallel_byte_identical(tmp_path):
    """The sharded module P (clean_sort_split_parallel) must produce
    byte-identical artifacts to the serial path at any worker count,
    including the GNU last-resort whole-line tie-break on lines sharing
    (chrom, tStart) and cross-shard locus chains. (The fork warnings
    this filter drops come from calling the fork pool directly under
    the test process's live JAX backend; production gates the parallel
    path on _fork_safe.)"""
    import os
    from mandalorion_tpu.core.cleanpsl import (clean_sort_split,
                                               clean_sort_split_parallel)

    def psl_line(name, chrom, t_start, sizes_starts, tail="x"):
        sizes, starts = zip(*sizes_starts)
        q_starts = []
        q = 0
        for s in sizes:
            q_starts.append(q)
            q += s
        t_end = starts[-1] + sizes[-1]
        cols = ["10", "0", "0", "0", "0", "0", "0", "0", "+", name,
                str(q), "0", str(q), chrom, "100000", str(t_start),
                str(t_end), str(len(sizes)),
                ",".join(map(str, sizes)) + ",",
                ",".join(map(str, q_starts)) + ",",
                ",".join(map(str, starts)) + ",",
                "0.99", f"=ACGT{tail}", "ACGT"]
        return "\t".join(cols) + "\n"

    lines = []
    # chrom ties at the same tStart differing only late in the line (the
    # last-resort byte compare decides), gaps below/above the intron
    # threshold, several loci and chromosomes, in scrambled input order
    lines.append(psl_line("r1", "chr2", 500, [(50, 500), (50, 600)]))
    lines.append(psl_line("r2", "chr1", 100, [(30, 100), (20, 135)]))
    lines.append(psl_line("r3", "chr1", 100, [(30, 100), (20, 135)],
                          tail="a"))
    lines.append(psl_line("r4", "chr1", 100, [(30, 100), (20, 135)],
                          tail="b"))
    lines.append(psl_line("r5", "chr1", 2000, [(40, 2000)]))
    lines.append(psl_line("r6", "chr1", 130, [(10, 130), (10, 240)]))
    lines.append(psl_line("r7", "chr3", 10, [(25, 10), (25, 40)]))
    for k in range(40):  # bulk so shards split mid-locus
        lines.append(psl_line(f"b{k}", "chr2", 1000 + 3 * k,
                              [(60, 1000 + 3 * k)]))
    psl = tmp_path / "in.psl"
    psl.write_text("".join(lines))

    def run(fn, tag, **kw):
        d = tmp_path / tag
        d.mkdir()
        fn(str(psl), str(d / "clean.psl"), str(d / "sorted.psl"),
           str(d / "ss"), 10, **kw)
        arts = {p: (d / p).read_bytes()
                for p in ("clean.psl", "sorted.psl")}
        for f in sorted(os.listdir(d / "ss")):
            arts[f"ss/{f}"] = (d / "ss" / f).read_bytes()
        return arts

    ref = run(clean_sort_split, "serial")
    for nw in (2, 5):
        got = run(clean_sort_split_parallel, f"par{nw}", threads=nw)
        assert got == ref, f"parallel (threads={nw}) != serial"
