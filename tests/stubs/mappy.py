"""Minimal mappy stand-in so reference scripts can run as test oracles
without the C extension. Implements only what the reference touches:
fastx_read, revcomp, and a trivial Aligner whose hits are always primary
forward-strand (adequate for oracle runs on all-forward synthetic reads).
"""

import gzip as _gzip

_COMP = bytes.maketrans(
    b"ACGTUacgtuNnRYSWKMBDHVryswkmbdhv-",
    b"TGCAAtgcaaNnYRSWMKVHDBYRSWMKVHDB-",
)


def revcomp(seq):
    return seq.translate(_COMP)[::-1]


def fastx_read(path):
    import os as _os
    if not _os.path.exists(path):
        return  # tolerate missing files (e.g. abpoa output when absent)
    op = _gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as fh:
        name, chunks = None, []
        mode = None
        for line in fh:
            line = line.rstrip("\n")
            if mode is None:
                mode = "fasta" if line.startswith(">") else "fastq"
            if mode == "fasta":
                if line.startswith(">"):
                    if name is not None:
                        yield name, "".join(chunks), None
                    name = line[1:].split()[0]
                    chunks = []
                else:
                    chunks.append(line)
            else:
                # fastq 4-line records
                if name is None:
                    name = line[1:].split()[0]
                    chunks = []
                else:
                    chunks.append(line)
                    if len(chunks) == 3:
                        yield name, chunks[0], chunks[2]
                        name = None
        if mode == "fasta" and name is not None:
            yield name, "".join(chunks), None


class _Hit:
    is_primary = True
    strand = 1


class Aligner:
    def __init__(self, seq=None, preset=None, **kw):
        self.seq = seq

    def map(self, seq):
        yield _Hit()
