"""Golden module-D parity: our aligner's locus files fed to the REFERENCE
defineIsoforms.py (subprocess, mappy stubbed, abpoa absent) must yield the
exact same read->isoform assignment (reads2isoforms.txt) and isoform
naming as our module D. This is the SURVEY acceptance-surface test for
the A→P→D front half on real pipeline artifacts."""

import os
import shutil

import numpy as np
import pytest

import oracle
import synthdata
from mandalorion_tpu.config import PipelineConfig
from mandalorion_tpu.io.fastx import revcomp, write_fasta
from mandalorion_tpu.pipeline.stages import (
    Paths, module_a, module_d, module_p)

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def pipeline_front(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_d")
    rng = np.random.default_rng(123)
    genome = synthdata.make_genome(30000, seed=77)
    g1 = [(3000, 3500), (5000, 5600), (7000, 7800)]
    g1b = [(3000, 3500), (7000, 7800)]
    g2 = [(15000, 15800), (17000, 17500)]
    genome = synthdata.plant_introns(genome, g1)
    genome = synthdata.plant_introns(genome, g1b)
    genome = synthdata.plant_introns(genome, g2, strand="-")
    (tmp / "genome.fasta").write_text(f">chr1\n{genome}\n")
    reads = []
    t1 = synthdata.transcript_seq(genome, g1)
    t1b = synthdata.transcript_seq(genome, g1b)
    t2 = revcomp(synthdata.transcript_seq(genome, g2))
    for i in range(25):
        r, _ = synthdata.mutate_read(t1, rng, 0.01)
        reads.append((f"a{i}", r))
    for i in range(7):
        r, _ = synthdata.mutate_read(t1b, rng, 0.01)
        reads.append((f"b{i}", r))
    for i in range(14):
        r, _ = synthdata.mutate_read(t2, rng, 0.01)
        reads.append((f"c{i}", r))
    write_fasta(str(tmp / "reads.fasta"), reads)
    gtf = (synthdata.gtf_lines("chr1", "G1", "T1", g1)
           + synthdata.gtf_lines("chr1", "G2", "T2", g2, strand="-"))
    (tmp / "ann.gtf").write_text(gtf)

    cfg = PipelineConfig(threads=1)
    paths = Paths(str(tmp / "out"))
    os.makedirs(paths.tmp, exist_ok=True)
    module_a(paths, cfg, str(tmp / "reads.fasta"),
             str(tmp / "genome.fasta"))
    module_p(paths, cfg)
    return tmp, paths, cfg


def test_reference_d_on_our_alignments(pipeline_front):
    tmp, paths, cfg = pipeline_front
    # reference defineIsoforms on OUR tmp_SS locus files
    ref_out = tmp / "ref_d"
    ref_out.mkdir()
    ref_ss = ref_out / "tmp_SS"
    shutil.copytree(paths.tmp_ss, ref_ss)
    r = oracle.run_script(
        "defineIsoforms.py",
        ["-i", paths.t("mm2Alignments.clean.sorted.psl"),
         "-p", str(ref_out), "-c", "0.1", "-g", str(tmp / "ann.gtf"),
         "-w", "1", "-m", "2", "-W", "0", "-n", "1",
         "-j", "gtag,gcag,atac,ctac,ctgc,gtat",
         "-u", "10", "-d", "50", "-a", "/nonexistent/abpoa"],
        # the reference redirects abpoa stderr to ./abpoa.messages
        # (SDC.py:917); run in the output dir so the spill stays in tmp
        cwd=str(ref_out))
    assert r.returncode == 0, r.stderr
    ref_r2i = (ref_out / "reads2isoforms.txt").read_text()

    # our module D on the same artifacts
    module_d(paths, cfg, str(tmp / "ann.gtf"))
    my_r2i = open(paths.t("reads2isoforms.txt")).read()

    assert my_r2i == ref_r2i
    # isoform names (with read counts) in the consensus fasta also match
    ref_names = [l[1:].strip() for l in
                 (ref_out / "Isoform_Consensi.fasta").read_text().splitlines()
                 if l.startswith(">")]
    my_names = [l[1:].strip() for l in
                open(paths.t("Isoform_Consensi.fasta"))
                if l.startswith(">")]
    assert my_names == ref_names
    assert len(my_names) == 3


def test_annotated_bins_used(pipeline_front):
    """With -W whitelisting enabled, the polyA BED gets written and
    annotated splice bins label junctions (smoke over the full D options
    surface)."""
    tmp, paths, cfg = pipeline_front
    cfg2 = cfg.replace(white_list_polyA=("T1", "T2"))
    module_d(paths, cfg2, str(tmp / "ann.gtf"))
    bed = open(paths.t("polyAWhiteList.bed")).read().splitlines()
    assert len(bed) == 2
    chroms = {l.split("\t")[0] for l in bed}
    assert chroms == {"chr1"}



def test_reference_emtrey_on_our_sam(pipeline_front, tmp_path):
    """Our SAM interop output fed to the REFERENCE emtrey.py must
    reproduce our extended PSL columns (coordinates, blocks, counts,
    accuracy) — the reference's own converter validates our alignment
    emission."""
    tmp, paths, cfg = pipeline_front
    from mandalorion_tpu.io.psl import read_psl
    from mandalorion_tpu.io.sam import write_sam
    from mandalorion_tpu.io.fastx import fastx_to_dict

    recs = list(read_psl(paths.t("mm2Alignments.psl")))
    genome = fastx_to_dict(str(tmp / "genome.fasta"))
    sam = tmp_path / "ours.sam"
    write_sam(str(sam), recs, {k: len(v) for k, v in genome.items()})
    out_psl = tmp_path / "emtrey.psl"
    r = oracle.run_script("emtrey.py", ["-i", str(sam), "-o", str(out_psl),
                                        "-m", "-t", "1"])
    assert r.returncode == 0, r.stderr
    theirs = {}
    for line in open(out_psl):
        a = line.rstrip("\n").split("\t")
        theirs[a[9]] = a
    assert len(theirs) == len(recs)
    for rec in recs:
        a = theirs[rec.q_name]
        assert int(a[0]) == rec.matches
        assert int(a[1]) == rec.mismatches
        assert int(a[3]) == rec.n_count
        assert int(a[5]) == rec.q_base_insert
        assert int(a[7]) == rec.t_base_insert
        assert a[8] == rec.strand
        assert int(a[15]) == rec.t_start and int(a[16]) == rec.t_end
        assert a[18] == ",".join(map(str, rec.block_sizes)) + ","
        assert a[20] == ",".join(map(str, rec.t_starts)) + ","
        assert abs(float(a[21]) - rec.accuracy) < 1e-9
        assert a[22] == rec.cs
        assert a[23] == rec.sequence
