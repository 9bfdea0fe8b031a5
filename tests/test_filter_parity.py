"""Parity tests for module F (filtering), gene grouping, and quantification
against the reference scripts run as oracles."""

import os

import numpy as np
import pytest

import oracle
import synthdata
from mandalorion_tpu.config import PipelineConfig
from mandalorion_tpu.core.filtering import (
    containment_filter, parse_clean_psl, ratio_filter, read_polya_whitelist)
from mandalorion_tpu.core.genes import group_isoforms
from mandalorion_tpu.core.quant import write_quant
from mandalorion_tpu.io.gtf import parse_gene_exons

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference tree not mounted")

CHROM = "chr1"


def _iso_line(name, chrom, strand, exons, q_size=None, q_start=0,
              q_end=None):
    aligned = sum(e - s for s, e in exons)
    q_size = q_size if q_size is not None else aligned
    q_end = q_end if q_end is not None else q_start + aligned
    sizes = ",".join(str(e - s) for s, e in exons) + ","
    tstarts = ",".join(str(s) for s, _ in exons) + ","
    qstarts = []
    q = q_start
    for s, e in exons:
        qstarts.append(q)
        q += e - s
    qst = ",".join(map(str, qstarts)) + ","
    return (f"{aligned}\t0\t0\t0\t0\t0\t0\t0\t{strand}\t{name}\t{q_size}\t"
            f"{q_start}\t{q_end}\t{chrom}\t100000\t{exons[0][0]}\t"
            f"{exons[-1][1]}\t{len(exons)}\t{sizes}\t{qst}\t{tstarts}")


@pytest.fixture(scope="module")
def filter_fixture(tmp_path_factory):
    """Isoform set covering every filter path: short, low-abundance, bad
    overhangs, contained low-ratio, polyA-extension victims."""
    tmp = tmp_path_factory.mktemp("filt")
    genome = synthdata.make_genome(100000, seed=21)
    # A-rich patch right after position 9000 (polyA-extension trigger)
    genome = genome[:9000] + "A" * 30 + genome[9030:]
    lines = [
        _iso_line("Isoform1_50", CHROM, "+", [(1000, 1500), (2000, 2600)]),
        # contained in Isoform1, lower abundance -> internal filter
        _iso_line("Isoform2_3", CHROM, "+", [(1040, 1500), (2000, 2560)]),
        # same exons, near-identical ends, lower abundance
        _iso_line("Isoform3_20", CHROM, "+", [(1010, 1500), (2000, 2590)]),
        # independent locus, fine
        _iso_line("Isoform4_10", CHROM, "+", [(5000, 5400), (6000, 6500)]),
        # ends right before A-rich patch, with Isoform6 extending past it
        _iso_line("Isoform5_5", CHROM, "+", [(8500, 9000)]),
        _iso_line("Isoform6_40", CHROM, "+", [(8500, 9500)]),
        # too short
        _iso_line("Isoform7_30", CHROM, "+", [(20000, 20100)]),
        # too few reads
        _iso_line("Isoform8_2", CHROM, "+", [(30000, 30400)]),
        # bad overhang (q_start 60 > max 40)
        _iso_line("Isoform9_30", CHROM, "+", [(40000, 40400)],
                  q_size=460, q_start=60),
        # minus strand pair
        _iso_line("Isoform10_25", CHROM, "-", [(50000, 50500), (51000, 51500)]),
        _iso_line("Isoform11_4", CHROM, "-", [(50030, 50500), (51000, 51470)]),
    ]
    psl = tmp / "clean.psl"
    psl.write_text("\n".join(lines) + "\n")
    return str(tmp), genome, str(psl)


def _load_ref_filter(tmp):
    return oracle.load_script_functions(
        "filterIsoforms.py",
        ["-p", tmp, "-i", "x.fasta", "-r", "0.05", "-R", "3", "-n", "1",
         "-G", "g.fa", "-O", "0,40,0,40", "-t", "1", "-A", "0.5", "-s", "1",
         "-d", "50", "-I", "200", "-m", "/tmp", "-M", "0",
         "--mm2_path", "x", "--emtrey_path", "y"],
        stop_at="main(infile)")


def test_filter_chain_parity(filter_fixture):
    tmp, genome, psl = filter_fixture
    ref = _load_ref_filter(tmp)
    wl = {"+": set(), "-": set()}
    psl_dict, psl_info, iso_set = ref.parse_clean_psl(psl, CHROM)
    count = ref.get_count(iso_set, CHROM, psl_dict)
    kept_ref = ref.filter_isoforms(count, iso_set, CHROM, psl_info,
                                   ref.overhangs, 200)
    final_ref = ref.look_for_contained_isoforms(
        kept_ref, CHROM, psl_dict, psl_info, genome, wl)

    cfg = PipelineConfig(minimum_ratio=0.05, minimum_reads=3,
                         minimum_internal_ratio=1.0)
    t = parse_clean_psl(psl, CHROM, cfg)
    assert set(t.names) == set(iso_set)
    kept = ratio_filter(t, t.names, cfg)
    assert kept == kept_ref
    final = containment_filter(t, kept, genome, wl, cfg)
    assert final == final_ref
    # sanity on the scenario itself
    assert "Isoform1_50" in final and "Isoform4_10" in final
    assert "Isoform2_3" not in final        # internal, low ratio
    assert "Isoform5_5" not in final        # polyA extension + A-rich
    assert "Isoform7_30" not in set(t.names)  # short, absolute filter


def test_filter_whitelist_rescues_polyA(filter_fixture):
    tmp, genome, psl = filter_fixture
    ref = _load_ref_filter(tmp)
    wl = {"+": {9000}, "-": set()}
    psl_dict, psl_info, iso_set = ref.parse_clean_psl(psl, CHROM)
    count = ref.get_count(iso_set, CHROM, psl_dict)
    kept_ref = ref.filter_isoforms(count, iso_set, CHROM, psl_info,
                                   ref.overhangs, 200)
    final_ref = ref.look_for_contained_isoforms(
        kept_ref, CHROM, psl_dict, psl_info, genome, wl)
    cfg = PipelineConfig(minimum_ratio=0.05, minimum_reads=3,
                         minimum_internal_ratio=1.0)
    t = parse_clean_psl(psl, CHROM, cfg)
    kept = ratio_filter(t, t.names, cfg)
    final = containment_filter(t, kept, genome, wl, cfg)
    assert final == final_ref
    # Isoform5_5 is rescued from the polyA filter by the whitelist but then
    # still dropped as internal to Isoform6_40 (mono-exon containment)
    assert "Isoform5_5" not in final


def test_polya_whitelist_reader(tmp_path):
    ref = _load_ref_filter(str(tmp_path))
    bed = tmp_path / "polyAWhiteList.bed"
    bed.write_text("chr1\t100\t140\tT1\t0\t+\nchr1\t200\t240\tT2\t0\t-\n"
                   "chr2\t5\t45\tT3\t0\t+\n")
    mine = read_polya_whitelist(str(bed), "chr1")
    theirs = ref.readWhiteList(str(bed), "chr1")
    assert mine["+"] == set(theirs["+"]) and mine["-"] == set(theirs["-"])


# ------------------------------------------------------------------- genes

def test_group_isoforms_parity(tmp_path):
    gtf = tmp_path / "ann.gtf"
    gtf.write_text(
        synthdata.gtf_lines(CHROM, "G1", "T1", [(1000, 1500), (2000, 2600)])
        + synthdata.gtf_lines(CHROM, "G2", "T2", [(5000, 5400)])
        + synthdata.gtf_lines(CHROM, "G3", "T3", [(50000, 51500)], strand="-"))
    lines = [
        _iso_line("Isoform1_50", CHROM, "+", [(1000, 1500), (2000, 2600)]),
        _iso_line("Isoform3_20", CHROM, "+", [(1010, 1500), (2000, 2590)]),
        _iso_line("Isoform4_10", CHROM, "+", [(5000, 5400)]),
        _iso_line("Isoform10_25", CHROM, "-", [(50000, 50500), (51000, 51500)]),
    ]
    psl = tmp_path / "sorted.psl"
    psl.write_text("\n".join(lines) + "\n")
    ref_out = tmp_path / "ref.genes"
    my_out = tmp_path / "mine.genes"
    r = oracle.run_script("groupIsoforms.py",
                          ["-i", str(psl), "-o", str(ref_out), "-g", str(gtf)])
    assert r.returncode == 0, r.stderr
    coord = parse_gene_exons(str(gtf))
    group_isoforms(str(psl), str(my_out), coord)
    assert my_out.read_text() == ref_out.read_text()


# ------------------------------------------------------------------- quant

def test_quant_parity(tmp_path):
    folder = tmp_path / "mando"
    folder.mkdir()
    s1 = tmp_path / "s1.fasta"
    s2 = tmp_path / "s2.fasta"
    s1.write_text(">r1\nACGT\n>r2\nACGT\n>r3\nACGT\n>r4\nACGT\n")
    s2.write_text(">q1\nACGT\n>q2\nACGT\n")
    (folder / "reads2isoforms.txt").write_text(
        "r1\tIsoform1_3\nr2\tIsoform1_3\nq1\tIsoform1_3\n"
        "r3\tIsoform2_1\nr4\tIsoform9_1\n")
    lines = [_iso_line("Isoform1_3", CHROM, "+", [(100, 200)]),
             _iso_line("Isoform2_1", CHROM, "+", [(300, 400)])]
    (folder / "Isoforms.filtered.clean.psl").write_text(
        "\n".join(lines) + "\n")
    r = oracle.run_script(
        "assignReadsToIsoforms.py",
        ["-m", str(folder), "-f", f"{s1},{s2}"])
    assert r.returncode == 0, r.stderr
    ref_quant = (folder / "Isoforms.filtered.clean.quant").read_text()
    ref_tpm = (folder / "Isoforms.filtered.clean.tpm").read_text()

    write_quant(str(folder / "Isoforms.filtered.clean.psl"),
                str(folder / "reads2isoforms.txt"),
                [str(s1), str(s2)],
                str(folder / "my.quant"), str(folder / "my.tpm"))
    assert (folder / "my.quant").read_text() == ref_quant
    assert (folder / "my.tpm").read_text() == ref_tpm
