"""HLA typing tests on a synthetic mini-locus: gene assignment by genomic
position, full-length allele matching ranked by (mismatches, indels)."""

import numpy as np
import pytest

import synthdata
from mandalorion_tpu.io.fastx import write_fasta
from mandalorion_tpu.utils.hla import (
    find_gene_matches, parse_allele_categories, type_alleles)


@pytest.fixture(scope="module")
def hla_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hla")
    genome = synthdata.make_genome(30000, seed=31)
    gene_a_span = (5000, 9000)
    gene_b_span = (15000, 19000)
    # isoforms: transcribed from inside each gene span
    iso_a = genome[5200:6800]
    iso_b = genome[15200:16900]
    write_fasta(str(tmp / "isoforms.fasta"),
                [("IsoA_10", iso_a), ("IsoB_7", iso_b)])
    (tmp / "genome.fasta").write_text(f">chr6\n{genome}\n")

    # allele database: A*01 exact, A*02 with 3 substitutions, B*01 exact
    rng = np.random.default_rng(5)
    a2, n_sub = synthdata.mutate_read(iso_a, rng, 0.004)
    while n_sub == 0:
        a2, n_sub = synthdata.mutate_read(iso_a, rng, 0.01)
    with open(tmp / "alleles.fasta", "w") as fh:
        fh.write(f">allele_a1 A*01:01\n{iso_a}\n")
        fh.write(f">allele_a2 A*02:01\n{a2}\n")
        fh.write(f">allele_b1 B*01:01\n{iso_b}\n")
    gene_list = [("HLA-A", "chr6", *gene_a_span),
                 ("HLA-B", "chr6", *gene_b_span)]
    return tmp, {"chr6": genome}, gene_list


def test_gene_match(hla_world):
    tmp, genome, gene_list = hla_world
    match = find_gene_matches(str(tmp / "isoforms.fasta"), genome,
                              gene_list)
    assert match == {"IsoA_10": "HLA-A", "IsoB_7": "HLA-B"}


def test_allele_categories(hla_world):
    tmp, _, _ = hla_world
    cats = parse_allele_categories(str(tmp / "alleles.fasta"))
    assert cats == {"allele_a1": "A*01:01", "allele_a2": "A*02:01",
                    "allele_b1": "B*01:01"}


def test_type_alleles(hla_world):
    tmp, genome, gene_list = hla_world
    match = find_gene_matches(str(tmp / "isoforms.fasta"), genome,
                              gene_list)
    results = type_alleles(str(tmp / "isoforms.fasta"), match,
                           str(tmp / "alleles.fasta"))
    by_iso = {name: (cat, mism) for name, cat, mism, _ind, _l in results}
    # exact allele wins over the mutated one
    assert by_iso["IsoA_10"][0] == "A*01:01"
    assert by_iso["IsoA_10"][1] == 0
    assert by_iso["IsoB_7"][0] == "B*01:01"
