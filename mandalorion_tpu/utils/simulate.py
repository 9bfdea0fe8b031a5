"""Synthetic dataset simulator: genomes, spliced transcripts, noisy reads.

Builds config-1-style datasets (BASELINE.md): a random genome with planted
multi-exon genes (canonical gt..ag introns), transcripts, reads with
substitution errors, plus the GTF annotation — used by bench.py, the
multichip dryrun (__graft_entry__.py), and the test suite (tests/synthdata
re-exports these). The reference ships no simulator; its acceptance data
is external (SURVEY §4 configs).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

BASES = np.array(list("ACGT"))


def make_genome(length: int, seed: int = 7) -> str:
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=length, dtype=np.uint8)
    return np.frombuffer(b"ACGT", np.uint8)[codes].tobytes().decode()


def plant_introns(genome: str, exons, strand: str = "+") -> str:
    """Force canonical intron motifs at the boundaries between exons:
    gt..ag on genome-forward for '+' transcripts, ct..ac for '-' ones.
    exons: list of (start, end) genomic half-open intervals, ascending."""
    donor, acceptor = ("GT", "AG") if strand == "+" else ("CT", "AC")
    g = list(genome)
    for (s1, e1), (s2, e2) in zip(exons, exons[1:]):
        g[e1] = donor[0]
        g[e1 + 1] = donor[1]
        g[s2 - 2] = acceptor[0]
        g[s2 - 1] = acceptor[1]
    return "".join(g)


def transcript_seq(genome: str, exons) -> str:
    return "".join(genome[s:e] for s, e in exons)


def gtf_lines(chrom: str, gene: str, tid: str, exons, strand: str = "+",
              tags: str = "") -> str:
    out = []
    attrs = (f'gene_id "{gene}"; transcript_id "{tid}"; '
             f'gene_name "{gene}N";{tags}')
    for s, e in exons:
        out.append(
            f"{chrom}\tsynth\texon\t{s + 1}\t{e}\t.\t{strand}\t.\t{attrs}")
    return "\n".join(out) + "\n"


def mutate_read(seq: str, rng: np.random.Generator, sub_rate: float = 0.0):
    """Introduce substitutions (keeps length). Returns (seq, n_subs)."""
    if sub_rate <= 0:
        return seq, 0
    arr = np.array(list(seq))
    mask = rng.random(len(arr)) < sub_rate
    subs = int(mask.sum())
    if subs:
        repl = rng.choice(BASES, size=subs)
        arr[mask] = repl
    return "".join(arr), subs


def make_dataset(out_dir: str, n_genes: int = 8, n_reads_per_gene: int = 250,
                 genome_len: int = 200_000, sub_rate: float = 0.01,
                 seed: int = 0,
                 exons_per_gene: Optional[Tuple[int, int]] = (2, 5)) -> int:
    """Write genome.fasta / reads.fasta / ann.gtf for a config-1-style
    multi-gene workload into out_dir; returns the read count."""
    from mandalorion_tpu.io.fastx import revcomp, write_fasta

    rng = np.random.default_rng(seed)
    genome = make_genome(genome_len, seed=9)
    genes: List[Tuple[List[Tuple[int, int]], str]] = []
    span = genome_len // n_genes
    for g in range(n_genes):
        base = g * span + 2000
        exons = []
        pos = base
        for _ in range(int(rng.integers(*exons_per_gene))):
            length = int(rng.integers(300, 800))
            exons.append((pos, pos + length))
            pos += length + int(rng.integers(200, 2000))
        strand = "+" if g % 2 == 0 else "-"
        genome = plant_introns(genome, exons, strand=strand)
        genes.append((exons, strand))

    reads = []
    gtf = []
    for gi, (exons, strand) in enumerate(genes):
        t = transcript_seq(genome, exons)
        if strand == "-":
            t = revcomp(t)
        for ri in range(n_reads_per_gene):
            r, _ = mutate_read(t, rng, sub_rate)
            reads.append((f"g{gi}r{ri}", r))
        gtf.append(gtf_lines("chr1", f"G{gi}", f"T{gi}", exons,
                             strand=strand))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "genome.fasta"), "w") as fh:
        fh.write(f">chr1\n{genome}\n")
    write_fasta(os.path.join(out_dir, "reads.fasta"), reads)
    with open(os.path.join(out_dir, "ann.gtf"), "w") as fh:
        fh.write("".join(gtf))
    return len(reads)
