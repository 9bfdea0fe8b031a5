"""Minimal BAM reader tests: hand-built BAM (gzip container, binary
records) -> fasta with primary-only + orientation restore."""

import gzip
import struct

from mandalorion_tpu.io.bam import bam_to_fasta, read_bam
from mandalorion_tpu.io.fastx import revcomp

_CODE = {b: i for i, b in enumerate("=ACMGRSVTWYHKDBN")}


def _pack_seq(seq):
    out = bytearray()
    for i in range(0, len(seq), 2):
        hi = _CODE[seq[i]] << 4
        lo = _CODE[seq[i + 1]] if i + 1 < len(seq) else 0
        out.append(hi | lo)
    return bytes(out)


def _record(name, flag, seq):
    name_b = name.encode() + b"\x00"
    body = struct.pack("<iiBBHHHiiii", -1, -1, len(name_b), 0, 0, 0, flag,
                       len(seq), -1, -1, 0)
    body += name_b + _pack_seq(seq) + b"\xff" * len(seq)
    return struct.pack("<i", len(body)) + body


def _write_bam(path, records):
    payload = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 0)
    for name, flag, seq in records:
        payload += _record(name, flag, seq)
    with gzip.open(path, "wb") as fh:
        fh.write(payload)


def test_bam_roundtrip(tmp_path):
    bam = tmp_path / "x.bam"
    _write_bam(str(bam), [
        ("r1", 4, "ACGTACGT"),          # unmapped primary (typical ccs)
        ("r2", 16, "AACCGGTT"),         # reverse: output revcomped
        ("r3", 256, "GGGG"),            # secondary: skipped
        ("r4", 2048, "TTTT"),           # supplementary: skipped
    ])
    recs = list(read_bam(str(bam)))
    assert [r[0] for r in recs] == ["r1", "r2", "r3", "r4"]
    assert recs[0][2] == "ACGTACGT"
    assert recs[1][2] == revcomp("AACCGGTT")

    out = tmp_path / "x.fasta"
    n = bam_to_fasta(str(bam), str(out))
    assert n == 2
    text = out.read_text()
    assert ">r1\nACGTACGT\n" in text
    assert ">r3" not in text and ">r4" not in text
