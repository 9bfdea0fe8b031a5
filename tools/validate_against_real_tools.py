#!/usr/bin/env python3
"""Validate this engine against REAL minimap2 / abPOA when available.

This environment has zero egress, so the external C tools the reference
shells out to (minimap2 at Mando.py:316-319 / filterIsoforms.py:488,
abpoa at SpliceDefineConsensus.py:915-919) cannot be installed, and every
in-repo golden test necessarily replays OUR alignments through the
reference's Python (tests/oracle.py). VERDICT r3 ("What's missing" #2)
asks that this gap stay on the books and be closed the moment an
egress-enabled round happens. This harness is that closure, ready to run:

    python tools/validate_against_real_tools.py \
        [--minimap2 PATH] [--abpoa PATH] [--out DIR]

With the binaries present it:

1.  Generates the config-1-style synthetic dataset (the bench workload)
    plus a higher-error variant.
2.  **Module A surface**: runs real `minimap2 -G 400k --secondary=no
    -ax splice:hq --cs=long -uf` and our aligner on the same reads, maps
    both through clean_psl, and reports per-read agreement on the
    DOWNSTREAM-VISIBLE surface (SURVEY §7 hard part #1: the extended PSL
    — cleaned block structure, strand, locus — is the equivalence
    surface, not the raw SAM).
3.  **Consensus surface**: for every isoform's oriented read set, runs
    real `abpoa -M 5 -r 0 [-S]` and our graph engine, and reports exact
    / near-exact consensus agreement.
4.  Writes fixture files (reads, real-tool outputs) under --out so the
    comparison can be committed and replayed OFFLINE afterwards
    (tests/test_real_tool_fixtures.py picks them up automatically if
    present).

Without the binaries it prints what it would do and exits 2, so CI can
distinguish "not validated here" from "validated and failed".
"""

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def find_tool(explicit, name):
    if explicit:
        return explicit if os.path.exists(explicit) else None
    return shutil.which(name)


def make_datasets(base):
    from mandalorion_tpu.utils.simulate import make_dataset
    sets = {}
    d1 = os.path.join(base, "config1")
    n1 = make_dataset(d1, n_genes=8, n_reads_per_gene=250,
                      genome_len=200_000)
    sets["config1"] = (d1, n1)
    d2 = os.path.join(base, "high_error")
    n2 = make_dataset(d2, n_genes=4, n_reads_per_gene=100,
                      genome_len=120_000, sub_rate=0.05)
    sets["high_error"] = (d2, n2)
    # >=8 kb isoforms: the consensus comparison feeds these through
    # abPOA's -S adaptive-band path (median read length >= 8000 triggers
    # -S below), the one consensus mode config1 never reaches
    d3 = os.path.join(base, "long_isoform")
    n3 = make_dataset(d3, n_genes=2, n_reads_per_gene=40,
                      genome_len=150_000, exons_per_gene=(4, 6),
                      exon_len=(1800, 2600))
    sets["long_isoform"] = (d3, n3)
    # every gene minus-strand and multi-exon: a decisive strand/splice
    # case for the module A comparison (minimap2 -uf + ts flipping)
    d4 = os.path.join(base, "minus_multiexon")
    n4 = make_dataset(d4, n_genes=4, n_reads_per_gene=60,
                      genome_len=120_000, exons_per_gene=(3, 6),
                      strand="-")
    sets["minus_multiexon"] = (d4, n4)
    return sets


def compare_module_a(mm2, data_dir, out_dir):
    """Real minimap2 vs our aligner on the cleaned-PSL surface."""
    from mandalorion_tpu.align.aligner import SpliceAligner
    from mandalorion_tpu.config import AlignConfig
    from mandalorion_tpu.core.cleanpsl import clean_record
    from mandalorion_tpu.io.fastx import fastx_to_dict, read_fastx
    from mandalorion_tpu.io.psl import parse_psl_line
    from mandalorion_tpu.io.sam import sam_to_psl

    genome = os.path.join(data_dir, "genome.fasta")
    reads = os.path.join(data_dir, "reads.fasta")
    sam = os.path.join(out_dir, "mm2.sam")
    with open(sam, "w") as out:
        subprocess.run(
            [mm2, "-G", "400k", "--secondary=no", "-ax", "splice:hq",
             "--cs=long", "-uf", genome, reads],
            stdout=out, check=True)
    mm2_psl = os.path.join(out_dir, "mm2.psl")
    sam_to_psl(sam, mm2_psl, mando=True)

    aligner = SpliceAligner(fastx_to_dict(genome), AlignConfig())
    ours = {}
    for name, seq, _q in read_fastx(reads):
        for rec in aligner.map_batch([(name, seq)]):
            ours[rec.q_name] = rec

    theirs = {}
    with open(mm2_psl) as fh:
        for line in fh:
            if line.strip():
                rec = parse_psl_line(line)
                theirs.setdefault(rec.q_name, rec)

    both = sorted(set(ours) & set(theirs))
    agree_locus = agree_strand = agree_blocks = 0
    for name in both:
        a, b = ours[name], theirs[name]
        if a.t_name == b.t_name and abs(a.t_start - b.t_start) < 50:
            agree_locus += 1
        if a.strand == b.strand:
            agree_strand += 1
        ca, cb = clean_record(a), clean_record(b)
        if ca.block_sizes == cb.block_sizes and ca.t_starts == cb.t_starts:
            agree_blocks += 1
    n = max(len(both), 1)
    print(f"  module A vs real minimap2: {len(both)} reads aligned by "
          f"both (ours {len(ours)}, mm2 {len(theirs)}); "
          f"locus {agree_locus / n:.1%}, strand {agree_strand / n:.1%}, "
          f"cleaned blocks {agree_blocks / n:.1%}")
    return {"both": len(both), "locus": agree_locus,
            "strand": agree_strand, "blocks": agree_blocks}


def compare_consensus(abpoa, data_dir, out_dir):
    """Real abpoa vs the graph engine on per-isoform consensi."""
    import numpy as np
    from mandalorion_tpu.config import PoaConfig
    from mandalorion_tpu.io.fastx import read_fastx
    from mandalorion_tpu.poa.consensus import determine_consensus

    by_gene = {}
    for name, seq, _q in read_fastx(os.path.join(data_dir, "reads.fasta")):
        # make_dataset names reads g<gene>r<read>
        by_gene.setdefault(name.split("r")[0], []).append((name, seq))

    exact = close = total = 0
    for gene, reads in sorted(by_gene.items()):
        cfg = PoaConfig()
        ours, _names = determine_consensus(reads, cfg,
                                           np.random.default_rng(0))
        # feed abpoa the same oriented subsample our engine consumed
        fa = os.path.join(out_dir, f"{gene}.fa")
        with open(fa, "w") as out:
            for name, seq in reads[:cfg.max_reads]:
                out.write(f">{name}\n{seq}\n")
        args = [abpoa, "-M", "5", "-r", "0"]
        lens = sorted(len(s) for _n, s in reads[:cfg.max_reads])
        if lens[len(lens) // 2] >= 8000:
            args.append("-S")
        res = subprocess.run(args + [fa], capture_output=True, text=True)
        theirs = "".join(res.stdout.split("\n")[1:]).strip()
        with open(os.path.join(out_dir, f"{gene}.abpoa.fa"), "w") as out:
            out.write(res.stdout)
        total += 1
        if ours == theirs:
            exact += 1
        else:
            import difflib
            ratio = difflib.SequenceMatcher(None, ours, theirs).ratio()
            if ratio > 0.995:
                close += 1
    print(f"  consensus vs real abpoa: {exact}/{total} exact, "
          f"{close}/{total} within 0.5% edit distance")
    return {"exact": exact, "close": close, "total": total}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minimap2", default=None)
    ap.add_argument("--abpoa", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "tools",
                                                  "real_tool_fixtures"))
    args = ap.parse_args()

    mm2 = find_tool(args.minimap2, "minimap2")
    abpoa = find_tool(args.abpoa, "abpoa")
    if not mm2 and not abpoa:
        print("neither minimap2 nor abpoa found on PATH — this harness "
              "needs an egress-enabled environment (see module "
              "docstring); nothing validated")
        return 2

    os.makedirs(args.out, exist_ok=True)
    with tempfile.TemporaryDirectory() as base:
        for label, (data_dir, _n) in make_datasets(base).items():
            print(f"{label}:")
            out_dir = os.path.join(args.out, label)
            os.makedirs(out_dir, exist_ok=True)
            for f in ("genome.fasta", "reads.fasta", "ann.gtf"):
                shutil.copy(os.path.join(data_dir, f), out_dir)
            if mm2:
                compare_module_a(mm2, data_dir, out_dir)
            if abpoa:
                compare_consensus(abpoa, data_dir, out_dir)
    print(f"fixtures written under {args.out} — commit them so "
          "tests/test_real_tool_fixtures.py replays the comparison "
          "offline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
