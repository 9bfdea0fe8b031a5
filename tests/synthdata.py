"""Synthetic genomes, transcripts, reads, and truth extended-PSL lines.

Shared generators live in mandalorion_tpu.utils.simulate (re-exported
here); this module adds the truth extended-PSL emitters the core-module
parity tests use, so they don't depend on the aligner.
"""

from __future__ import annotations

import numpy as np

from mandalorion_tpu.utils.simulate import (  # noqa: F401
    BASES, gtf_lines, make_genome, mutate_read, plant_introns,
    transcript_seq)

def truth_psl_line(name: str, genome: str, exons, chrom: str = "chr1",
                   strand: str = "+", left_extra: int = 0,
                   right_extra: int = 0, extra_seq: str = "T") -> str:
    """Extended PSL line for an error-free read covering `exons` exactly,
    with optional soft-clipped extra bases on each end. cs string covers
    the aligned portion (matches + introns)."""
    seq = transcript_seq(genome, exons)
    aligned = len(seq)
    q_size = aligned + left_extra + right_extra
    q_start = left_extra
    q_end = left_extra + aligned
    t_start = exons[0][0]
    t_end = exons[-1][1]
    sizes = [e - s for s, e in exons]
    t_starts = [s for s, _ in exons]
    q_starts = [q_start]
    for z in sizes[:-1]:
        q_starts.append(q_starts[-1] + z)
    cs = ""
    n_bases = 0
    for i, (s, e) in enumerate(exons):
        cs += "=" + genome[s:e]
        if i + 1 < len(exons):
            gap = exons[i + 1][0] - e
            n_bases += gap
            cs += f"~{genome[e:e+2].lower()}{gap}{genome[exons[i+1][0]-2:exons[i+1][0]].lower()}"
    full_seq = extra_seq * left_extra + seq + extra_seq * right_extra
    cols = [
        aligned, 0, 0, n_bases, 0, 0, 0, 0, strand, name, q_size, q_start,
        q_end, chrom, len(genome), t_start, t_end, len(sizes),
        ",".join(map(str, sizes)) + ",",
        ",".join(map(str, q_starts)) + ",",
        ",".join(map(str, t_starts)) + ",",
        1.0, cs, full_seq,
    ]
    return "\t".join(str(c) for c in cols)


def noisy_psl_line(name, genome, exons, rng, sub_rate=0.02, chrom="chr1"):
    """Extended PSL line for a read with substitution errors: cs string
    carries '=' runs and '*' tokens; accuracy reflects the mismatches."""
    pieces = []
    n_bases = 0
    matches = 0
    mismatches = 0
    read_parts = []
    for i, (s, e) in enumerate(exons):
        ref = genome[s:e]
        mut, _ = mutate_read(ref, rng, sub_rate)
        read_parts.append(mut)
        run = ""
        for r_base, m_base in zip(ref, mut):
            if r_base == m_base:
                run += m_base
                matches += 1
            else:
                if run:
                    pieces.append("=" + run)
                    run = ""
                pieces.append("*" + r_base.lower() + m_base.lower())
                mismatches += 1
        if run:
            pieces.append("=" + run)
        if i + 1 < len(exons):
            gap = exons[i + 1][0] - e
            n_bases += gap
            pieces.append(f"~{genome[e:e+2].lower()}{gap}"
                          f"{genome[exons[i+1][0]-2:exons[i+1][0]].lower()}")
    seq = "".join(read_parts)
    sizes = [e - s for s, e in exons]
    t_starts = [s for s, _ in exons]
    q_starts = [0]
    for z in sizes[:-1]:
        q_starts.append(q_starts[-1] + z)
    accuracy = matches / (matches + mismatches)
    cols = [matches, mismatches, 0, n_bases, 0, 0, 0, 0, "+", name,
            len(seq), 0, len(seq), chrom, len(genome), t_starts[0],
            exons[-1][1], len(sizes),
            ",".join(map(str, sizes)) + ",",
            ",".join(map(str, q_starts)) + ",",
            ",".join(map(str, t_starts)) + ",",
            accuracy, "".join(pieces), seq]
    return "\t".join(str(c) for c in cols)
