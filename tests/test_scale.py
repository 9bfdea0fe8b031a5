"""Config-4-style scale regression (opt-in: `pytest -m scale`).

A scaled-down (300 Mbp, 4-chromosome) variant of tools/run_config4.py
wired into pytest with hard floors on peak RSS and alignment throughput,
so index-build or seed-scatter regressions get caught before a full
3.1 Gbp run (VERDICT r3 #8). The floors are 2-core-host figures with
slack for shared-box noise; tools/run_config4.py remains the full-scale
harness."""

import os
import resource
import time

import numpy as np
import pytest

import synthdata
from mandalorion_tpu.config import AlignConfig, PipelineConfig
from mandalorion_tpu.io.fastx import revcomp, write_fasta
from mandalorion_tpu.pipeline.stages import run_pipeline


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


@pytest.mark.scale
def test_config4_scaled_300mbp(tmp_path):
    n_chroms, chrom_len, genes_per_chrom, per_gene = 4, 75_000_000, 2, 40
    rng = np.random.default_rng(0)
    reads = []
    gtf = []
    truth_chroms = {}
    genome_path = tmp_path / "genome.fasta"
    with open(genome_path, "w") as gfh:
        for ci in range(n_chroms):
            chrom = f"chr{ci + 1}"
            g = synthdata.make_genome(chrom_len, seed=700 + ci)
            span = chrom_len // genes_per_chrom
            for k in range(genes_per_chrom):
                base = k * span + 50_000
                exons = []
                pos = base
                for _ in range(int(rng.integers(2, 5))):
                    ln = int(rng.integers(250, 900))
                    exons.append((pos, pos + ln))
                    pos += ln + int(rng.integers(500, 30_000))
                strand = "+" if (ci + k) % 2 == 0 else "-"
                g = synthdata.plant_introns(g, exons, strand=strand)
                t = synthdata.transcript_seq(g, exons)
                if strand == "-":
                    t = revcomp(t)
                for ri in range(per_gene):
                    r, _ = synthdata.mutate_read(t, rng, 0.01)
                    reads.append((f"c{ci}g{k}r{ri}", r))
                gtf.append(synthdata.gtf_lines(
                    chrom, f"G{ci}_{k}", f"T{ci}_{k}", exons,
                    strand=strand))
                truth_chroms[chrom] = truth_chroms.get(chrom, 0) + 1
            gfh.write(f">{chrom}\n{g}\n")
            del g
    write_fasta(str(tmp_path / "reads.fasta"), reads)
    (tmp_path / "ann.gtf").write_text("".join(gtf))

    cfg = PipelineConfig(threads=os.cpu_count() or 2,
                         align=AlignConfig(
                             index_cache=str(tmp_path / "genome.idx")))
    t0 = time.time()
    run_pipeline(str(tmp_path / "out"), str(genome_path),
                 str(tmp_path / "ann.gtf"), str(tmp_path / "reads.fasta"),
                 cfg)
    dt = time.time() - t0

    iso_chroms = {}
    for line in open(tmp_path / "out" / "Isoforms.filtered.clean.psl"):
        f = line.split("\t")
        iso_chroms[f[13]] = iso_chroms.get(f[13], 0) + 1
    # every planted gene recovers exactly one isoform on its chromosome
    assert iso_chroms == truth_chroms, (iso_chroms, truth_chroms)

    # regression floors (2-core shared host; r4 measured ~61 s wall,
    # index build dominating, peak RSS ~4 GB). Per-stage floors come from
    # the pipeline's own timing.tsv so the one-off index build cannot
    # mask an alignment regression (and vice versa).
    rss = _rss_gb()
    assert rss < 10.0, f"peak RSS regression: {rss:.1f} GB"
    assert dt < 420, f"wall regression: {dt:.0f}s"
    stages = dict(line.split("\t")[:2] for line in
                  open(tmp_path / "out" / "tmp" / "timing.tsv")
                  if "\t" in line)
    t_idx = float(stages["index_build"])
    t_a = float(stages["A_alignment"])
    assert t_idx < 300, f"index-build regression: {t_idx:.0f}s for 300 Mbp"
    a_rps = len(reads) / max(t_a, 1e-9)
    assert a_rps > 100, f"alignment regression: {a_rps:.0f} reads/s " \
                        f"({t_a:.1f}s for {len(reads)} reads at 300 Mbp)"
