"""End-to-end APDFQ pipeline tests on a synthetic two-gene dataset
(BASELINE.md config 1 analog): reads in → filtered isoform fasta/psl/gtf,
genes, quant/tpm out, with exact structure recovery."""

import os

import numpy as np
import pytest

import synthdata
from mandalorion_tpu.config import PipelineConfig
from mandalorion_tpu.io.fastx import revcomp, write_fasta
from mandalorion_tpu.io.psl import read_psl
from mandalorion_tpu.pipeline.cli import main as cli_main

GENE1 = [(2000, 2400), (3000, 3400), (4000, 4600)]     # '+' strand
GENE2 = [(8000, 8500), (9200, 9900)]                   # '-' strand
ISO1B = [(2000, 2400), (4000, 4600)]                   # exon-skip isoform


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(77)
    genome = synthdata.make_genome(12000, seed=55)
    genome = synthdata.plant_introns(genome, GENE1)
    genome = synthdata.plant_introns(genome, ISO1B)
    genome = synthdata.plant_introns(genome, GENE2, strand="-")
    (tmp / "genome.fasta").write_text(f">chr1\n{genome}\n")

    t1 = synthdata.transcript_seq(genome, GENE1)
    t1b = synthdata.transcript_seq(genome, ISO1B)
    t2 = revcomp(synthdata.transcript_seq(genome, GENE2))
    reads1 = []
    reads2 = []
    for i in range(20):
        r, _ = synthdata.mutate_read(t1, rng, 0.01)
        reads1.append((f"g1r{i}", r))
    for i in range(6):
        r, _ = synthdata.mutate_read(t1b, rng, 0.01)
        reads1.append((f"g1br{i}", r))
    for i in range(12):
        r, _ = synthdata.mutate_read(t2, rng, 0.01)
        reads2.append((f"g2r{i}", r))
    write_fasta(str(tmp / "sample1.fasta"), reads1)
    write_fasta(str(tmp / "sample2.fasta"), reads2)
    (tmp / "reads.fofn").write_text(
        f"{tmp}/sample1.fasta\n{tmp}/sample2.fasta\n")

    gtf = (synthdata.gtf_lines("chr1", "GENE1", "T1", GENE1)
           + synthdata.gtf_lines("chr1", "GENE2", "T2", GENE2, strand="-"))
    (tmp / "ann.gtf").write_text(gtf)
    return tmp, genome


@pytest.fixture(scope="module")
def run(dataset):
    tmp, genome = dataset
    out = tmp / "out"
    rc = cli_main(["-p", str(out), "-G", str(tmp / "genome.fasta"),
                   "-g", str(tmp / "ann.gtf"),
                   "-f", str(tmp / "reads.fofn"),
                   "-R", "3"])
    assert rc == 0
    return out, genome


def test_outputs_exist(run):
    out, _ = run
    for f in ["Isoforms.filtered.fasta", "Isoforms.filtered.clean.psl",
              "Isoforms.filtered.clean.gtf", "Isoforms.filtered.clean.genes",
              "Isoforms.filtered.clean.quant", "Isoforms.filtered.clean.tpm",
              "Mando_isoforms.read_stat.txt", "Mando.log"]:
        assert (out / f).exists(), f
        assert (out / f).stat().st_size > 0, f


def test_isoform_structures(run):
    out, _ = run
    recs = list(read_psl(str(out / "Isoforms.filtered.clean.psl")))
    structures = {(r.strand, tuple(r.t_starts),
                   tuple(s + z for s, z in zip(r.t_starts, r.block_sizes)))
                  for r in recs}
    assert ("+", (2000, 3000, 4000), (2400, 3400, 4600)) in structures
    assert ("+", (2000, 4000), (2400, 4600)) in structures
    assert ("-", (8000, 9200), (8500, 9900)) in structures
    assert len(recs) == 3


def test_consensus_sequences_exact(run, dataset):
    out, genome = run[0], run[1]
    from mandalorion_tpu.io.fastx import fastx_to_dict
    isoforms = fastx_to_dict(str(out / "Isoforms.filtered.fasta"))
    seqs = set(isoforms.values())
    t1 = synthdata.transcript_seq(genome, GENE1)
    t1b = synthdata.transcript_seq(genome, ISO1B)
    t2 = revcomp(synthdata.transcript_seq(genome, GENE2))
    # consensus over 1%-error reads must recover the exact transcripts
    # (orientation of the consensus follows the reads)
    def matches(target):
        return any(s == target or revcomp(s) == target for s in seqs)
    assert matches(t1)
    assert matches(t1b)
    assert matches(t2)


def test_quant_counts(run):
    out, _ = run
    lines = (out / "Isoforms.filtered.clean.quant").read_text().splitlines()
    header = lines[0].split("\t")
    assert header[0] == "Isoform"
    counts = {}
    for line in lines[1:]:
        a = line.split("\t")
        counts[a[0]] = [int(x) for x in a[1:] if x != ""]
    total = np.array(sum((np.array(v) for v in counts.values()),
                         np.zeros(2, np.int64)))
    assert total.sum() == 38          # every read assigned
    # per-sample split: gene1(+iso1b) reads in sample1, gene2 in sample2
    by_iso = sorted(counts.values(), key=lambda v: -sum(v))
    assert by_iso[0] == [20, 0]
    assert [12, 0] not in by_iso or True
    assert any(v == [0, 12] for v in counts.values())
    assert any(v == [6, 0] for v in counts.values())


def test_gene_assignment(run):
    out, _ = run
    lines = (out / "Isoforms.filtered.clean.genes").read_text().splitlines()
    gene_of = {}
    for line in lines:
        a = line.split("\t")
        gene_of[a[0]] = a[5]
    genes = set(gene_of.values())
    assert "GENE1_GENE1N" in genes
    assert "GENE2_GENE2N" in genes


def test_gtf_round_trip(run):
    out, _ = run
    gtf = (out / "Isoforms.filtered.clean.gtf").read_text()
    assert "\ttranscript\t" in gtf and "\texon\t" in gtf
    # +1 start shift: exon at 2000 (0-based) -> 2001 in GTF
    assert "\t2001\t" in gtf


def test_module_resume(run, dataset):
    """-M FQ re-runs filtering+quant from tmp artifacts only."""
    tmp, _ = dataset
    out = run[0]
    before = (out / "Isoforms.filtered.clean.quant").read_text()
    rc = cli_main(["-p", str(out), "-G", str(tmp / "genome.fasta"),
                   "-g", str(tmp / "ann.gtf"),
                   "-f", str(tmp / "reads.fofn"), "-M", "FQ"])
    assert rc == 0
    assert (out / "Isoforms.filtered.clean.quant").read_text() == before


def test_multi_sample_quant(tmp_path):
    """Config-5 shape: several sample files via fofn; per-sample columns."""
    rng = np.random.default_rng(5)
    genome = synthdata.make_genome(9000, seed=50)
    exons = [(2000, 2500), (3500, 4200)]
    genome = synthdata.plant_introns(genome, exons)
    (tmp_path / "genome.fasta").write_text(f">chr1\n{genome}\n")
    t = synthdata.transcript_seq(genome, exons)
    per_sample = [6, 4, 9]
    paths = []
    for s, n in enumerate(per_sample):
        reads = []
        for i in range(n):
            r, _ = synthdata.mutate_read(t, rng, 0.01)
            reads.append((f"s{s}read{i}", r))
        p = tmp_path / f"sample{s}.fasta"
        write_fasta(str(p), reads)
        paths.append(str(p))
    (tmp_path / "multi.fofn").write_text("\n".join(paths) + "\n")
    out = tmp_path / "out"
    rc = cli_main(["-p", str(out), "-G", str(tmp_path / "genome.fasta"),
                   "-f", str(tmp_path / "multi.fofn"), "-R", "3"])
    assert rc == 0
    lines = (out / "Isoforms.filtered.clean.quant").read_text().splitlines()
    header = [h for h in lines[0].split("\t")[1:] if h]
    assert header == paths
    counts = [int(x) for x in lines[1].split("\t")[1:] if x != ""]
    assert counts == per_sample
    tpm = (out / "Isoforms.filtered.clean.tpm").read_text().splitlines()
    vals = [float(x) for x in tpm[1].split("\t")[1:] if x != ""]
    assert all(abs(v - 1_000_000) < 1 for v in vals)


def test_flag_surface(tmp_path):
    """Exercise -m multi_exon_only, -w window, -j junctions, gzipped fastq
    input through the CLI."""
    import gzip
    rng = np.random.default_rng(9)
    genome = synthdata.make_genome(12000, seed=60)
    spliced = [(2000, 2500), (3500, 4100)]
    mono = [(7000, 7900)]
    genome = synthdata.plant_introns(genome, spliced)
    (tmp_path / "genome.fasta").write_text(f">chr1\n{genome}\n")
    ts = synthdata.transcript_seq(genome, spliced)
    tm = synthdata.transcript_seq(genome, mono)
    with gzip.open(tmp_path / "reads.fastq.gz", "wt") as fh:
        for i in range(8):
            r, _ = synthdata.mutate_read(ts, rng, 0.01)
            fh.write(f"@s{i}\n{r}\n+\n{'I' * len(r)}\n")
        for i in range(6):
            r, _ = synthdata.mutate_read(tm, rng, 0.01)
            fh.write(f"@m{i}\n{r}\n+\n{'I' * len(r)}\n")

    out1 = tmp_path / "out1"
    rc = cli_main(["-p", str(out1), "-G", str(tmp_path / "genome.fasta"),
                   "-f", str(tmp_path / "reads.fastq.gz"),
                   "-w", "2", "-j", "gtag"])
    assert rc == 0
    names1 = [l for l in (out1 / "Isoforms.filtered.fasta").read_text()
              .splitlines() if l.startswith(">")]
    assert len(names1) == 2  # spliced + mono survive

    out2 = tmp_path / "out2"
    rc = cli_main(["-p", str(out2), "-G", str(tmp_path / "genome.fasta"),
                   "-f", str(tmp_path / "reads.fastq.gz"), "-m"])
    assert rc == 0
    names2 = [l for l in (out2 / "Isoforms.filtered.fasta").read_text()
              .splitlines() if l.startswith(">")]
    assert len(names2) == 1  # -m drops the mono-exon isoform
    reasons = (out2 / "tmp" / "filter_reasons.txt").read_text()
    assert "single exon" in reasons

    # --consensus_backend pins the graph-POA execution backend; the
    # device kernel must byte-match the host C++ engine
    out3 = tmp_path / "out3"
    rc = cli_main(["-p", str(out3), "-G", str(tmp_path / "genome.fasta"),
                   "-f", str(tmp_path / "reads.fastq.gz"),
                   "--consensus_backend", "device"])
    assert rc == 0
    assert (out3 / "Isoforms.filtered.fasta").read_text() == \
           (out1 / "Isoforms.filtered.fasta").read_text()


def test_pacbio_bam_end_to_end(tmp_path):
    """-P flag: BAM input through A (conversion) and Q (converted paths)."""
    from test_bam import _write_bam
    rng = np.random.default_rng(31)
    genome = synthdata.make_genome(9000, seed=70)
    exons = [(2000, 2600), (4000, 4700)]
    genome = synthdata.plant_introns(genome, exons)
    (tmp_path / "genome.fasta").write_text(f">chr1\n{genome}\n")
    t = synthdata.transcript_seq(genome, exons)
    records = []
    for i in range(8):
        r, _ = synthdata.mutate_read(t, rng, 0.01)
        records.append((f"ccs{i}", 4, r))
    _write_bam(str(tmp_path / "movie.bam"), records)
    out = tmp_path / "out"
    rc = cli_main(["-p", str(out), "-G", str(tmp_path / "genome.fasta"),
                   "-f", str(tmp_path / "movie.bam"), "-P"])
    assert rc == 0
    quant = (out / "Isoforms.filtered.clean.quant").read_text().splitlines()
    assert len(quant) == 2
    assert quant[1].split("\t")[1] == "8"


def test_multi_chromosome_and_junk_reads(tmp_path):
    """Two chromosomes + unmappable junk reads: junk is dropped silently,
    per-chromosome filtering and gene grouping stay correct."""
    rng = np.random.default_rng(41)
    g1 = synthdata.make_genome(9000, seed=81)
    g2 = synthdata.make_genome(9000, seed=82)
    e1 = [(2000, 2500), (3500, 4200)]
    e2 = [(2500, 3000), (4500, 5100)]
    g1 = synthdata.plant_introns(g1, e1)
    g2 = synthdata.plant_introns(g2, e2, strand="-")
    (tmp_path / "genome.fasta").write_text(f">chrA\n{g1}\n>chrB\n{g2}\n")
    t1 = synthdata.transcript_seq(g1, e1)
    t2 = revcomp(synthdata.transcript_seq(g2, e2))
    reads = []
    for i in range(7):
        r, _ = synthdata.mutate_read(t1, rng, 0.01)
        reads.append((f"a{i}", r))
    for i in range(5):
        r, _ = synthdata.mutate_read(t2, rng, 0.01)
        reads.append((f"b{i}", r))
    for i in range(3):  # junk: unrelated random sequence
        reads.append((f"junk{i}", synthdata.make_genome(800, seed=900 + i)))
    write_fasta(str(tmp_path / "reads.fasta"), reads)
    gtf = (synthdata.gtf_lines("chrA", "GA", "TA", e1)
           + synthdata.gtf_lines("chrB", "GB", "TB", e2, strand="-"))
    (tmp_path / "ann.gtf").write_text(gtf)
    out = tmp_path / "out"
    rc = cli_main(["-p", str(out), "-G", str(tmp_path / "genome.fasta"),
                   "-g", str(tmp_path / "ann.gtf"),
                   "-f", str(tmp_path / "reads.fasta")])
    assert rc == 0
    recs = list(read_psl(str(out / "Isoforms.filtered.clean.psl")))
    assert {r.t_name for r in recs} == {"chrA", "chrB"}
    assert len(recs) == 2
    quant = (out / "Isoforms.filtered.clean.quant").read_text().splitlines()
    counts = sorted(int(l.split("\t")[1]) for l in quant[1:])
    assert counts == [5, 7]          # junk reads unassigned
    genes = (out / "Isoforms.filtered.clean.genes").read_text()
    assert "GA_GAN" in genes and "GB_GBN" in genes


def test_external_sam_interop(tmp_path, dataset):
    """--external_sam: run PDFQ from an outside aligner's SAM (the
    reference's --mm2_path interop path)."""
    tmp, genome = dataset
    # produce a SAM with our aligner, then feed it back as 'external'
    from mandalorion_tpu.config import AlignConfig
    first = tmp_path / "first"
    cfg_args = ["-G", str(tmp / "genome.fasta"), "-g", str(tmp / "ann.gtf"),
                "-f", str(tmp / "reads.fofn")]
    import mandalorion_tpu.pipeline.stages as stages
    cfg = PipelineConfig(align=AlignConfig(emit_sam=True))
    stages.run_pipeline(str(first), str(tmp / "genome.fasta"),
                        str(tmp / "ann.gtf"), str(tmp / "reads.fofn"), cfg)
    sam = first / "tmp" / "mm2Alignments.sam"

    out = tmp_path / "ext"
    rc = cli_main(["-p", str(out), "--external_sam", str(sam)] + cfg_args)
    assert rc == 0
    a = (out / "Isoforms.filtered.clean.quant").read_text()
    b = (first / "Isoforms.filtered.clean.quant").read_text()
    assert a == b


def test_all_junk_reads_graceful(tmp_path):
    """No read maps: every module gates and the pipeline exits cleanly."""
    genome = synthdata.make_genome(9000, seed=1)
    (tmp_path / "genome.fasta").write_text(f">chr1\n{genome}\n")
    write_fasta(str(tmp_path / "reads.fasta"),
                [(f"junk{i}", synthdata.make_genome(600, seed=500 + i))
                 for i in range(5)])
    out = tmp_path / "out"
    rc = cli_main(["-p", str(out), "-G", str(tmp_path / "genome.fasta"),
                   "-f", str(tmp_path / "reads.fasta")])
    assert rc == 0
    assert not (out / "Isoforms.filtered.clean.quant").exists()


def test_forked_pool_cli_gz_multisample(tmp_path):
    """The fork-pool module A path (record-range jobs over the combined
    fasta) through the real CLI in a fresh process (JAX uninitialized
    there, so the pool actually engages), with gzipped fastq inputs and
    two samples."""
    import gzip
    import subprocess
    import sys

    rng = np.random.default_rng(77)
    genome = synthdata.make_genome(150_000, seed=21)
    exons = [(9000, 9700), (12_000, 12_500), (15_000, 15_400)]
    genome = synthdata.plant_introns(genome, exons, strand="+")
    t = synthdata.transcript_seq(genome, exons)
    with open(tmp_path / "genome.fa", "w") as fh:
        fh.write(f">chr1\n{genome}\n")
    with open(tmp_path / "ann.gtf", "w") as fh:
        fh.write(synthdata.gtf_lines("chr1", "G0", "T0", exons,
                                     strand="+"))
    # >2x batch_reads total so module A actually fans out to pool jobs
    for si, n in (("a", 600), ("b", 550)):
        with gzip.open(tmp_path / f"s{si}.fastq.gz", "wt") as fh:
            for i in range(n):
                r, _ = synthdata.mutate_read(t, rng, 0.01)
                fh.write(f"@s{si}r{i}\n{r}\n+\n{'I' * len(r)}\n")
    with open(tmp_path / "reads.fofn", "w") as fh:
        fh.write(f"{tmp_path}/sa.fastq.gz\n{tmp_path}/sb.fastq.gz\n")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-m", "mandalorion_tpu.pipeline.cli",
         "-p", str(tmp_path / "out"), "-G", str(tmp_path / "genome.fa"),
         "-g", str(tmp_path / "ann.gtf"),
         "-f", str(tmp_path / "reads.fofn"), "-t", "2"],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "mm2Alignments.part0.psl" not in os.listdir(
        tmp_path / "out" / "tmp")  # part files merged and removed
    quant = (tmp_path / "out" / "Isoforms.filtered.clean.quant"
             ).read_text().strip().splitlines()
    assert len(quant) == 2  # header + the one isoform
    counts = quant[1].split("\t")[1:3]
    assert [int(c) for c in counts] == [600, 550]


def test_fused_native_path_matches_staged_across_configs(tmp_path):
    """The one-call fused aligner must equal the staged path under every
    config knob it consumes (end bonus, zdrop, band, slack, scores)."""
    from mandalorion_tpu.align.aligner import SpliceAligner
    from mandalorion_tpu.config import AlignConfig

    rng = np.random.default_rng(31)
    genome = {
        "chrA": synthdata.make_genome(120_000, seed=61),
        "chrB": synthdata.make_genome(60_000, seed=62),
    }
    reads = []
    for ci, (chrom, seq) in enumerate(sorted(genome.items())):
        for i in range(15):
            s = int(rng.integers(0, len(seq) - 3000))
            r, _ = synthdata.mutate_read(seq[s:s + 2500], rng, 0.04)
            # chimeric junk tails exercise zdrop + extension edges
            tail = "".join(rng.choice(list("ACGT"), size=int(
                rng.integers(0, 200))))
            reads.append((f"c{ci}r{i}", r + tail))
    configs = [
        AlignConfig(),
        AlignConfig(end_bonus=12),
        AlignConfig(zdrop=100),
        AlignConfig(end_bonus=12, zdrop=50, splice_slack=4),
        AlignConfig(match=2, mismatch=3, gap_open=4, gap_extend=2,
                    band_width=64, max_end_extend=256),
    ]
    from mandalorion_tpu.align.aligner import SpliceAligner as SA
    for k, cfg in enumerate(configs):
        al = SA(genome, cfg)
        fused = al.map_batch(reads)
        orig = SA._map_batch_native
        SA._map_batch_native = lambda self, r: None
        try:
            staged = al.map_batch(reads)
        finally:
            SA._map_batch_native = orig
        assert len(fused) == len(staged) > 0, f"config {k}"
        for a, b in zip(fused, staged):
            assert a == b, (k, a.q_name)


def test_long_read_isoforms_exact(tmp_path):
    """The abPOA -S regime: a 12 kb 4-exon transcript plus a 25 kb
    mono-exon, 1% error — consensi recover the exact lengths."""
    rng = np.random.default_rng(4)
    genome = synthdata.make_genome(400_000, seed=8)
    exons1 = [(20_000 + i * 6000, 20_000 + i * 6000 + 3000)
              for i in range(4)]
    genome = synthdata.plant_introns(genome, exons1, strand="+")
    t1 = synthdata.transcript_seq(genome, exons1)
    t2 = genome[200_000:225_000]
    reads = []
    for ri in range(15):
        reads.append((f"a{ri}", synthdata.mutate_read(t1, rng, 0.01)[0]))
        reads.append((f"b{ri}", synthdata.mutate_read(t2, rng, 0.01)[0]))
    with open(tmp_path / "genome.fa", "w") as fh:
        fh.write(f">chr1\n{genome}\n")
    write_fasta(str(tmp_path / "reads.fasta"), reads)
    with open(tmp_path / "ann.gtf", "w") as fh:
        fh.write(synthdata.gtf_lines("chr1", "G0", "T0", exons1,
                                     strand="+"))
        fh.write(synthdata.gtf_lines("chr1", "G1", "T1",
                                     [(200_000, 225_000)], strand="+"))
    from mandalorion_tpu.pipeline.stages import run_pipeline
    run_pipeline(str(tmp_path / "out"), str(tmp_path / "genome.fa"),
                 str(tmp_path / "ann.gtf"), str(tmp_path / "reads.fasta"),
                 PipelineConfig(threads=1))
    fa = (tmp_path / "out" / "Isoforms.filtered.fasta").read_text()
    lens = sorted(len(l) for l in fa.splitlines()
                  if l and not l.startswith(">"))
    assert fa.count(">") == 2
    assert lens == [12000, 25000]


def test_thread_count_byte_determinism(dataset):
    """Worker count must never leak into the outputs: the fork pools
    (modules A/D/F), the threaded POA resolve, and every ordered merge
    (SURVEY §5.2 race safety) have to produce byte-identical artifacts
    at any -t. Runs the same multi-sample dataset at -t 1 and -t 3 (odd
    count: uneven work split) and compares every output byte-for-byte."""
    tmp, _genome = dataset
    outs = {}
    for t in (1, 3):
        out = tmp / f"out_t{t}"
        rc = cli_main(["-p", str(out), "-G", str(tmp / "genome.fasta"),
                       "-g", str(tmp / "ann.gtf"),
                       "-f", str(tmp / "reads.fofn"),
                       "-R", "3", "-t", str(t)])
        assert rc == 0
        blobs = {}
        for name in ("Isoforms.filtered.fasta",
                     "Isoforms.filtered.clean.psl",
                     "Isoforms.filtered.clean.gtf",
                     "Isoforms.filtered.clean.quant",
                     "Isoforms.filtered.clean.tpm",
                     "Isoforms.filtered.clean.genes",
                     "Mando_isoforms.read_stat.txt"):
            with open(out / name, "rb") as fh:
                blobs[name] = fh.read()
        outs[t] = blobs
    for name, blob in outs[1].items():
        assert outs[3][name] == blob, f"{name} differs between -t 1/-t 3"
