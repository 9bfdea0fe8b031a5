#!/usr/bin/env python3
"""Benchmark: end-to-end isoform pipeline throughput on one TPU chip.

Prints ONE JSON line: reads aligned+assigned per second per chip on a
synthetic config-1-style dataset (BASELINE.md): multi-gene genome,
spliced + mono-exon transcripts, 1 % substitution error reads, full APDFQ.

vs_baseline compares against the reference pipeline's MEASURED throughput
on this exact workload (tools/measure_reference_baseline.py): the reference
ran end-to-end with stub minimap2/abpoa binaries that replay our
precomputed alignments — i.e. its alignment and consensus compute were
FREE — and completed at 106.92 reads/s (2000 reads, 18.7 s wall, 8
threads; same dataset as the bench). The baseline is therefore
conservative: the real reference (paying for minimap2 + abPOA) is slower.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

# measured via tools/measure_reference_baseline.py (see module docstring)
REFERENCE_READS_PER_SEC = 106.92


def make_dataset(tmp, n_genes=8, n_reads_per_gene=250, genome_len=200_000):
    import synthdata
    from mandalorion_tpu.io.fastx import revcomp, write_fasta

    rng = np.random.default_rng(0)
    genome = synthdata.make_genome(genome_len, seed=9)
    genes = []
    span = genome_len // n_genes
    for g in range(n_genes):
        base = g * span + 2000
        exons = []
        pos = base
        for _ in range(int(rng.integers(2, 5))):
            length = int(rng.integers(300, 800))
            exons.append((pos, pos + length))
            pos += length + int(rng.integers(200, 2000))
        strand = "+" if g % 2 == 0 else "-"
        genome = synthdata.plant_introns(genome, exons, strand=strand)
        genes.append((exons, strand))

    reads = []
    gtf = []
    for gi, (exons, strand) in enumerate(genes):
        t = synthdata.transcript_seq(genome, exons)
        if strand == "-":
            t = revcomp(t)
        for ri in range(n_reads_per_gene):
            r, _ = synthdata.mutate_read(t, rng, 0.01)
            reads.append((f"g{gi}r{ri}", r))
        gtf.append(synthdata.gtf_lines("chr1", f"G{gi}", f"T{gi}", exons,
                                       strand=strand))
    with open(os.path.join(tmp, "genome.fasta"), "w") as fh:
        fh.write(f">chr1\n{genome}\n")
    write_fasta(os.path.join(tmp, "reads.fasta"), reads)
    with open(os.path.join(tmp, "ann.gtf"), "w") as fh:
        fh.write("".join(gtf))
    return len(reads)


def main():
    import contextlib

    from mandalorion_tpu.config import PipelineConfig
    from mandalorion_tpu.pipeline.stages import run_pipeline

    with tempfile.TemporaryDirectory() as tmp:
        n_reads = make_dataset(tmp)
        cfg = PipelineConfig(threads=os.cpu_count() or 8)
        best_dt = None
        for attempt in range(2):  # best of two: damp shared-host noise
            out_dir = os.path.join(tmp, f"out{attempt}")
            t0 = time.time()
            with contextlib.redirect_stdout(sys.stderr):  # ONE json line
                run_pipeline(out_dir,
                             os.path.join(tmp, "genome.fasta"),
                             os.path.join(tmp, "ann.gtf"),
                             os.path.join(tmp, "reads.fasta"), cfg)
            dt = time.time() - t0
            best_dt = dt if best_dt is None else min(best_dt, dt)
            quant = os.path.join(out_dir, "Isoforms.filtered.clean.quant")
            assert os.path.exists(quant) and os.path.getsize(quant) > 0
        rps = n_reads / best_dt
    print(json.dumps({
        "metric": "reads aligned+assigned per sec per chip (APDFQ e2e)",
        "value": round(rps, 2),
        "unit": "reads/s",
        "vs_baseline": round(rps / REFERENCE_READS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
