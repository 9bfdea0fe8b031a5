"""Satellite-tool tests: polyA trimming (parity vs reference state
machine), TPM conversion (parity vs reference script), LRGASP export,
PSLX conversion, HLA typing, SNP phasing."""

import os

import numpy as np
import pytest

import oracle
import synthdata
from mandalorion_tpu.core.quant import convert_quant_to_tpm
from mandalorion_tpu.io.fastx import revcomp, write_fasta
from mandalorion_tpu.utils.lrgasp import export_lrgasp
from mandalorion_tpu.utils.phaser import (
    create_haplotypes, parse_reads, read_vcf, sort_reads)
from mandalorion_tpu.utils.polya import (
    orient_and_trim, remove_polya, trim_fastx)
from mandalorion_tpu.utils.pslx import psl_to_pslx


# ------------------------------------------------------------ polyA parity

def _reference_remove_polya():
    mod = oracle.load_script_functions(
        "utils/removePolyA.py",
        ["-i", "x", "-o", "y", "-t", "0,0"], stop_at="def main")
    return mod.removePolyA


POLYA_CASES = [
    "ACGTACGTACGT" + "A" * 20,
    "ACGTACGTACGT" + "A" * 20 + "GC",          # 2 trailing non-A
    "ACGTACGTACGT" + "A" * 6 + "G" + "A" * 8,  # interrupted tail
    "ACGTACGTACGT" + "A" * 5,                  # never arms
    "A" * 30,                                  # all A: armed to the end
    "ACGT" + "A" * 6 + "GCT" + "ACGT" * 3,     # tail then junk
    "GGAATTAAGGAAAATTAAAAAAGG" + "A" * 10,
    "",
]


@pytest.mark.skipif(not oracle.reference_available(), reason="no reference")
@pytest.mark.parametrize("seq", POLYA_CASES)
def test_remove_polya_parity(seq):
    ref_fn = _reference_remove_polya()
    ref_trimmed, ref_state = ref_fn(seq)
    mine, state = remove_polya(seq)
    assert (mine, state) == (ref_trimmed, ref_state)


@pytest.mark.skipif(not oracle.reference_available(), reason="no reference")
def test_remove_polya_parity_random():
    ref_fn = _reference_remove_polya()
    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(0, 80))
        seq = "".join(rng.choice(list("ACGT"), size=n,
                                 p=[0.4, 0.2, 0.2, 0.2]))
        assert remove_polya(seq) == tuple(ref_fn(seq))


def test_orient_and_trim():
    tail = "ACGTGCGTACGTCCGT" * 4 + "A" * 15
    assert orient_and_trim(tail) == remove_polya(tail)[0]
    assert orient_and_trim(revcomp(tail)) == remove_polya(tail)[0]
    assert orient_and_trim("ACGT" * 10) is None


def test_trim_fastx(tmp_path):
    src = tmp_path / "in.fasta"
    write_fasta(str(src), [("r1", "NNACGTGCGT" + "A" * 12 + "NN")])
    out = tmp_path / "out.fasta"
    n = trim_fastx(str(src), str(out), trimmed_bases=(2, 2))
    assert n == 1
    body = out.read_text().splitlines()[1]
    assert body == "ACGTGCGTA"  # end-trim then tail trim leaves one A


# --------------------------------------------------------------- TPM parity

@pytest.mark.skipif(not oracle.reference_available(), reason="no reference")
def test_convert_quant_to_tpm_parity(tmp_path):
    quant = tmp_path / "q.quant"
    quant.write_text("Isoform\ts1\ts2\t\n"
                     "Iso1_5\t5\t0\t\n"
                     "Iso2_3\t3\t6\t\n"
                     "Iso3_2\t2\t4\t\n")
    ref_out = tmp_path / "ref.tpm"
    r = oracle.run_script("utils/convertQuantToTPM.py",
                          [str(quant), str(ref_out)])
    assert r.returncode == 0, r.stderr
    my_out = tmp_path / "my.tpm"
    convert_quant_to_tpm(str(quant), str(my_out))
    assert my_out.read_text() == ref_out.read_text()


# ------------------------------------------------------------------ LRGASP

def test_export_lrgasp(tmp_path):
    mando = tmp_path / "mando"
    (mando / "tmp").mkdir(parents=True)
    (mando / "Isoforms.filtered.clean.psl").write_text(
        "0\t0\t0\t0\t0\t0\t0\t0\t+\tIso1_3\t10\t0\t10\tchr1\t100\t0\t10\t1"
        "\t10,\t0,\t0,\n")
    (mando / "Isoforms.filtered.clean.gtf").write_text("chr1\tx\n")
    (mando / "Isoforms.filtered.clean.quant").write_text(
        "Isoform\ts1\t\nIso1_3\t4\t\n")
    (mando / "tmp" / "reads2isoforms.txt").write_text(
        "r1\tIso1_3\nr2\tIso1_3\nr3\tDropped_1\n")
    m = tmp_path / "models"
    e = tmp_path / "expr"
    export_lrgasp(str(mando), str(m), str(e), ["sampleA"])
    assert (m / "models.gtf").exists() and (e / "models.gtf").exists()
    rm = (m / "read_model_map.tsv").read_text().splitlines()
    assert rm[0] == "read_id\ttranscript_id"
    assert len(rm) == 3 and all("Iso1_3" in x for x in rm[1:])
    expr = (e / "expression.tsv").read_text().splitlines()
    assert expr[0].startswith("ID\tsampleA")
    assert expr[1].split("\t")[1] == "1000000.0"


# -------------------------------------------------------------------- PSLX

def test_psl_to_pslx(tmp_path):
    psl = tmp_path / "a.psl"
    psl.write_text(
        "8\t0\t0\t0\t0\t0\t0\t0\t+\tr1\t8\t0\t8\tt1\t20\t2\t10\t2"
        "\t4,4,\t0,4,\t2,6,\n")
    reads = {"r1": "ACGTTGCA"}
    targets = {"t1": "NNACGTTGCANNNNNNNNNN"}
    out = tmp_path / "a.pslx"
    psl_to_pslx(str(psl), reads, targets, str(out))
    a = out.read_text().strip().split("\t")
    assert a[21] == "ACGT,TGCA,"
    assert a[22] == "ACGT,TGCA,"


# ------------------------------------------------------------------ phaser

def test_phaser_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    genome = synthdata.make_genome(2000, seed=2)
    # two het SNPs at 500 and 1200 (0-based), linked haplotypes
    g = list(genome)
    ref1, alt1 = g[500], "T" if g[500] != "T" else "G"
    ref2, alt2 = g[1200], "C" if g[1200] != "C" else "G"
    vcf = tmp_path / "v.vcf"
    vcf.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts\n"
        f"chr1\t501\t.\t{ref1}\t{alt1}\t50\tPASS\t.\tGT\t0/1\n"
        f"chr1\t1201\t.\t{ref2}\t{alt2}\t50\tPASS\t.\tGT\t0/1\n")

    hap0 = genome[300:1500]
    hap1 = list(hap0)
    hap1[500 - 300] = alt1
    hap1[1200 - 300] = alt2
    hap1 = "".join(hap1)

    pslx = tmp_path / "reads.pslx"
    lines = []
    for i in range(30):
        seq = hap0 if i % 2 == 0 else hap1
        lines.append(
            f"1200\t0\t0\t0\t0\t0\t0\t0\t+\tread{i}\t1200\t0\t1200\tchr1"
            f"\t2000\t300\t1500\t1\t1200,\t0,\t300,\t{seq},\t"
            f"{genome[300:1500]},")
    pslx.write_text("\n".join(lines) + "\n")

    snps = read_vcf(str(vcf))
    assert snps["chr1"][501][0][0] == ref1
    groups, connections, snp_dict, reads, snp_count, read_minimum = \
        parse_reads(snps, str(pslx))
    assert snp_count[("chr1", 501, ref1)] == 15
    assert snp_count[("chr1", 501, alt1)] == 15
    haplo = create_haplotypes(groups, connections, snps, snp_count,
                              read_minimum, str(tmp_path / "snp.bed"))
    assert ("chr1", 501, ref1) in haplo
    assert ("chr1", 1201, alt2) in haplo
    # alleles on the same read end up in the same haplotype
    assert haplo[("chr1", 501, ref1)][1] == haplo[("chr1", 1201, ref2)][1]
    assert haplo[("chr1", 501, alt1)][1] == haplo[("chr1", 1201, alt2)][1]
    assert haplo[("chr1", 501, ref1)][1] != haplo[("chr1", 501, alt1)][1]

    counts = sort_reads(haplo, snp_dict, reads, str(tmp_path / "sorted"))
    assert counts["0"] == 15 and counts["1"] == 15
    a1 = (tmp_path / "sorted.allele1").read_text()
    a2 = (tmp_path / "sorted.allele2").read_text()
    assert len(a1.splitlines()) == 15 and len(a2.splitlines()) == 15
