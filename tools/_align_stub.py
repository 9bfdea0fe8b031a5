#!/usr/bin/env python3
"""Helper for the minimap2 replay stub: align a fasta with our aligner and
print SAM to stdout (used for the reference's consensus realignment call)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    genome_path, reads_path = sys.argv[1], sys.argv[2]
    from mandalorion_tpu.align.aligner import SpliceAligner
    from mandalorion_tpu.io.fastx import fastx_to_dict, read_fastx
    from mandalorion_tpu.io.sam import psl_to_sam_line

    genome = fastx_to_dict(genome_path)
    aligner = SpliceAligner(genome)
    sys.stdout.write("@HD\tVN:1.6\n")
    for name, seq in genome.items():
        sys.stdout.write(f"@SQ\tSN:{name}\tLN:{len(seq)}\n")
    reads = [(n, s) for n, s, _ in read_fastx(reads_path)]
    for i in range(0, len(reads), 512):
        for rec in aligner.map_batch(reads[i:i + 512]):
            sys.stdout.write(psl_to_sam_line(rec) + "\n")


if __name__ == "__main__":
    main()
