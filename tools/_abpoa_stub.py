#!/usr/bin/env python3
"""Replay stub for the reference's `abpoa -M 5 -r 0 [-S] reads.fa` call
(SpliceDefineConsensus.py:915-919): emit OUR pipeline's consensus for the
isoform the input reads belong to, so the reference's downstream
coordinates are built from the same consensus sequences as ours and the
golden genes-file comparison can be BYTE-exact (VERDICT r4 #5) instead of
tolerating the reference's random-backbone end wobble (its dead-stub
fallback used `sequences[0]` of an unseeded subsample).

Usage: _abpoa_stub.py <our_out_dir> <reads.fa>  (prints fasta to stdout)
"""

import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    out_dir, reads_fa = sys.argv[1], sys.argv[2]
    from mandalorion_tpu.io.fastx import read_fastx

    read2iso = {}
    with open(os.path.join(out_dir, "tmp", "reads2isoforms.txt")) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                read2iso[parts[0]] = parts[1]
    consensi = {name: seq for name, seq, _q in read_fastx(
        os.path.join(out_dir, "tmp", "Isoform_Consensi.fasta"))}

    votes = Counter()
    for name, _seq, _q in read_fastx(reads_fa):
        iso = read2iso.get(name)
        if iso is not None:
            votes[iso] += 1
    if not votes:
        return  # no output: the reference falls back to sequences[0]
    iso = votes.most_common(1)[0][0]
    seq = consensi.get(iso)
    if seq:
        sys.stdout.write(f">{iso}\n{seq}\n")


if __name__ == "__main__":
    main()
