#!/usr/bin/env python3
"""Config-4-scale run (BASELINE.md configs[3]): whole-hg38-sized genome —
3.1 Gbp over 24 chromosomes — index build + persistent mmap cache + full
APDFQ on reads from genes planted across every chromosome.

Usage: python tools/run_config4.py [gbp] [n_chroms] [genes_per_chrom]
                                   [reads_per_gene]
Defaults: 3.1 Gbp, 24 chroms, 3 genes/chrom, 100 reads/gene.

Reports per-phase wall clock + peak RSS and verifies every planted gene
recovers an isoform on its own chromosome with exact exon structure
counts. The index persists to a directory cache (memory-mapped .npy
arrays — the minimap2 .mmi analogue at hg38 scale) so a second run skips
the build.
"""

import json
import os
import resource
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    import numpy as np
    from mandalorion_tpu.config import AlignConfig, PipelineConfig
    from mandalorion_tpu.io.fastx import revcomp, write_fasta
    from mandalorion_tpu.pipeline.stages import run_pipeline
    from mandalorion_tpu.utils.simulate import (
        gtf_lines, make_genome, mutate_read, transcript_seq)

    gbp = float(sys.argv[1]) if len(sys.argv) > 1 else 3.1
    n_chroms = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    genes_per_chrom = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    per_gene = int(sys.argv[4]) if len(sys.argv) > 4 else 100

    tmp = tempfile.mkdtemp(prefix="config4_")
    chrom_len = int(gbp * 1e9) // n_chroms
    rng = np.random.default_rng(0)

    print(f"generating {gbp} Gbp / {n_chroms} chroms "
          f"({chrom_len / 1e6:.0f} Mbp each) ...", flush=True)
    t0 = time.time()
    reads = []
    gtf = []
    genome_path = os.path.join(tmp, "genome.fasta")
    truth = []  # (chrom, n_exons)
    with open(genome_path, "w") as gfh:
        for ci in range(n_chroms):
            chrom = f"chr{ci + 1}"
            g = make_genome(chrom_len, seed=100 + ci)
            glist = list(g)
            span = chrom_len // genes_per_chrom
            for k in range(genes_per_chrom):
                base = k * span + 50_000
                exons = []
                pos = base
                for _ in range(int(rng.integers(2, 6))):
                    ln = int(rng.integers(200, 1000))
                    exons.append((pos, pos + ln))
                    pos += ln + int(rng.integers(500, 50_000))
                strand = "+" if (ci + k) % 2 == 0 else "-"
                donor, acc = ("GT", "AG") if strand == "+" else ("CT", "AC")
                for (s1, e1), (s2, e2) in zip(exons, exons[1:]):
                    glist[e1], glist[e1 + 1] = donor[0], donor[1]
                    glist[s2 - 2], glist[s2 - 1] = acc[0], acc[1]
                g2 = "".join(glist)
                t = transcript_seq(g2, exons)
                if strand == "-":
                    t = revcomp(t)
                for ri in range(per_gene):
                    r, _ = mutate_read(t, rng, 0.01)
                    reads.append((f"c{ci}g{k}r{ri}", r))
                gtf.append(gtf_lines(chrom, f"G{ci}_{k}", f"T{ci}_{k}",
                                     exons, strand=strand))
                truth.append((chrom, len(exons)))
                glist = list(g2)
            gfh.write(f">{chrom}\n{''.join(glist)}\n")
            del glist, g
    write_fasta(os.path.join(tmp, "reads.fasta"), reads)
    with open(os.path.join(tmp, "ann.gtf"), "w") as fh:
        fh.write("".join(gtf))
    t_gen = time.time() - t0
    print(f"  dataset: {len(reads)} reads, {t_gen:.0f}s, "
          f"RSS {rss_gb():.1f} GB", flush=True)

    cache = os.path.join(tmp, "genome.idx")
    cfg = PipelineConfig(threads=os.cpu_count() or 2,
                         align=AlignConfig(index_cache=cache))
    t0 = time.time()
    run_pipeline(os.path.join(tmp, "out"), genome_path,
                 os.path.join(tmp, "ann.gtf"),
                 os.path.join(tmp, "reads.fasta"), cfg)
    dt = time.time() - t0

    out = os.path.join(tmp, "out")
    iso_chroms = {}
    n_exons = {}
    for line in open(os.path.join(out, "Isoforms.filtered.clean.psl")):
        f = line.split("\t")
        iso_chroms.setdefault(f[13], 0)
        iso_chroms[f[13]] += 1
        n_exons[f[9]] = int(f[17])
    want = {}
    for chrom, _ne in truth:
        want[chrom] = want.get(chrom, 0) + 1
    exact_chroms = sum(1 for c, n in want.items()
                       if iso_chroms.get(c, 0) == n)
    cache_gb = sum(os.path.getsize(os.path.join(cache, f))
                   for f in os.listdir(cache)) / 1e9
    timing = open(os.path.join(out, "tmp", "timing.tsv")).read()
    print(timing)
    print(json.dumps({
        "genome_gbp": gbp, "n_chroms": n_chroms,
        "n_reads": len(reads), "wall_s": round(dt, 1),
        "reads_per_s": round(len(reads) / dt, 1),
        "genes_planted": len(truth),
        "isoforms_found": sum(iso_chroms.values()),
        "chroms_exact": f"{exact_chroms}/{n_chroms}",
        "index_cache_gb": round(cache_gb, 1),
        "peak_rss_gb": round(rss_gb(), 1),
    }))
    print(f"(cache kept at {cache} — rerun with it to time the mmap load)")
    print(tmp)


if __name__ == "__main__":
    main()
