"""IO layer tests: fastx round trips, PSL parse/format, SAM→PSL conversion
semantics (emtrey parity per SURVEY §2.4 probed facts), GTF parsing."""

import gzip

import pytest

from mandalorion_tpu.io.fastx import (
    expand_fofn, fastx_to_dict, read_fastx, revcomp, write_fasta)
from mandalorion_tpu.io.gtf import parse_annotation, parse_gene_exons
from mandalorion_tpu.io.psl import (
    format_psl, parse_psl_line, psl_sort_key, sort_psl_file)
from mandalorion_tpu.io.sam import filter_sam, sam_to_psl_line


def test_revcomp():
    assert revcomp("ACGT") == "ACGT"
    assert revcomp("AACGTG") == "CACGTT"
    assert revcomp("acgtn") == "nacgt"


def test_fasta_roundtrip(tmp_path):
    p = str(tmp_path / "x.fasta")
    recs = [("read1", "ACGTACGT"), ("read2 extra", "GGGG")]
    write_fasta(p, recs)
    got = list(read_fastx(p))
    assert got[0] == ("read1", "ACGTACGT", None)
    # names truncate at whitespace, mappy-style
    assert got[1][0] == "read2"


def test_fasta_multiline(tmp_path):
    p = str(tmp_path / "m.fasta")
    with open(p, "w") as fh:
        fh.write(">a\nACGT\nACGT\n>b\nTTTT\n")
    got = dict((n, s) for n, s, _ in read_fastx(p))
    assert got == {"a": "ACGTACGT", "b": "TTTT"}


def test_fastq_and_gzip(tmp_path):
    p = str(tmp_path / "x.fastq.gz")
    with gzip.open(p, "wt") as fh:
        fh.write("@r1\nACGT\n+\nIIII\n@r2 desc\nGGTT\n+\nIIII\n")
    got = list(read_fastx(p))
    assert got == [("r1", "ACGT", "IIII"), ("r2", "GGTT", "IIII")]
    assert fastx_to_dict(p) == {"r1": "ACGT", "r2": "GGTT"}


def test_expand_fofn(tmp_path):
    f = tmp_path / "reads.fofn"
    f.write_text("/a/x.fasta\n/b/y.fastq\n")
    assert expand_fofn(str(f)) == ["/a/x.fasta", "/b/y.fastq"]
    assert expand_fofn("/a/x.fasta,/b/y.fq") == ["/a/x.fasta", "/b/y.fq"]
    assert expand_fofn("/a/x.fasta") == ["/a/x.fasta"]


PSL_LINE = ("10\t1\t0\t100\t0\t0\t0\t0\t+\tread1\t11\t0\t11\tchr1\t1000\t5\t"
            "126\t2\t5,6,\t0,5,\t5,110,")


def test_psl_roundtrip():
    rec = parse_psl_line(PSL_LINE)
    assert rec.q_name == "read1"
    assert rec.block_sizes == [5, 6]
    assert rec.t_starts == [5, 110]
    assert format_psl(rec) == PSL_LINE


def test_psl_extended_roundtrip():
    line = PSL_LINE + "\t0.98\t=ACGTG~gt100ag=CGTACG\tACGTGCGTACG"
    rec = parse_psl_line(line)
    assert rec.extended
    assert rec.accuracy == 0.98
    assert format_psl(rec) == line


def test_psl_sort(tmp_path):
    lines = [
        "0\t0\t0\t0\t0\t0\t0\t0\t+\tr%d\t5\t0\t5\t%s\t100\t%d\t%d\t1\t5,\t0,\t%d,\n"
        % (i, c, s, s + 5, s)
        for i, (c, s) in enumerate([("chr2", 10), ("chr1", 50), ("chr1", 5)])
    ]
    src = tmp_path / "in.psl"
    dst = tmp_path / "out.psl"
    src.write_text("".join(lines))
    sort_psl_file(str(src), str(dst))
    out = dst.read_text().splitlines()
    assert [ln.split("\t")[13] for ln in out] == ["chr1", "chr1", "chr2"]
    assert [int(ln.split("\t")[15]) for ln in out] == [5, 50, 10]


def _sam_fields(cigar, flag=0, pos=101, seq="ACGTACGTACGT", tags=()):
    f = ["read1", str(flag), "chr1", str(pos), "60", cigar, "*", "0", "0",
         seq, "I" * len(seq)]
    f.extend(tags)
    return f


def test_sam_to_psl_basic():
    # 4M2I4M100N2M: blocks at M runs; I advances q, N advances t
    fields = _sam_fields("4M2I4M100N2M",
                         tags=["NM:i:3", "nn:i:0", "cs:Z:=ACGT+ac=ACGT~gt100ag=AC"])
    line = sam_to_psl_line(fields, 5000, mando=True)
    a = line.split("\t")
    # matches = M - mismatch ; mismatch = NM - (I+D) - nn = 3-2-0 = 1
    assert a[0] == "9" and a[1] == "1"
    assert a[3] == "100"          # intron bases
    assert a[4] == "1" and a[5] == "2"   # one insert of 2 bases
    assert a[8] == "+"
    assert a[10] == "12"          # q_size = M+I = 10+2
    assert a[15] == "100"         # t_start = pos-1
    assert a[16] == "210"         # t_start + M + N = 100+10+100
    assert a[17] == "3"
    assert a[18] == "4,4,2,"
    assert a[19] == "0,6,10,"
    assert a[20] == "100,104,208,"
    acc = float(a[21])
    assert abs(acc - 9 / 12) < 1e-9
    assert a[23] == "ACGTACGTACGT"


def test_sam_to_psl_clipping_and_strand():
    fields = _sam_fields("3S6M3S", flag=16, seq="AAATTTTTTGGG")
    line = sam_to_psl_line(fields, 5000, mando=True)
    a = line.split("\t")
    assert a[8] == "-"
    assert a[11] == "3"          # q_start = leading clip
    assert a[12] == "9"          # q_end = len - trailing clip
    # col 23 restores original orientation: revcomp of SAM SEQ
    assert a[23] == revcomp("AAATTTTTTGGG")


def test_sam_to_psl_ts_flip():
    fields = _sam_fields("6M", seq="ACGTAC", tags=["NM:i:0", "ts:A:-"])
    a = sam_to_psl_line(fields, 5000).split("\t")
    assert a[8] == "-"          # '+' flag flipped by ts:A:-
    fields = _sam_fields("6M", flag=16, seq="ACGTAC", tags=["NM:i:0", "ts:A:-"])
    a = sam_to_psl_line(fields, 5000).split("\t")
    assert a[8] == "+"          # '-' flag flipped back


def test_filter_sam(tmp_path):
    sam = tmp_path / "in.sam"
    sam.write_text(
        "@SQ\tSN:chr1\tLN:1000\n"
        + "\t".join(_sam_fields("4M", flag=0)) + "\n"
        + "\t".join(_sam_fields("4M", flag=256)) + "\n"
        + "\t".join(_sam_fields("4M", flag=2048)) + "\n")
    out = tmp_path / "out.sam"
    filter_sam(str(sam), str(out))
    lines = out.read_text().splitlines()
    assert len(lines) == 2  # header + primary only


GTF = """chr1\tHAVANA\tgene\t100\t900\t.\t+\t.\tgene_id "G1"; gene_name "GENE1";
chr1\tHAVANA\texon\t100\t200\t.\t+\t.\tgene_id "G1"; transcript_id "T1"; gene_name "GENE1"; tag "basic";
chr1\tHAVANA\texon\t300\t400\t.\t+\t.\tgene_id "G1"; transcript_id "T1"; gene_name "GENE1"; tag "basic";
chr1\tHAVANA\texon\t500\t900\t.\t+\t.\tgene_id "G1"; transcript_id "T1"; gene_name "GENE1"; tag "basic";
"""


def test_parse_annotation(tmp_path):
    g = tmp_path / "ann.gtf"
    g.write_text(GTF)
    ann = parse_annotation(str(g), ["ZZNOMATCH"])
    # internal edges only: exon ends 200,400 (not 900); exon starts 300,500 (-1)
    assert ann.left_bounds["chr1"]["5"] == [200, 400]
    assert ann.right_bounds["chr1"]["3"] == [299, 499]
    assert ann.polya_whitelist == []
    ann2 = parse_annotation(str(g), ["basic"])
    assert ann2.polya_whitelist == [("chr1", "+", "900", "T1")]
    # reference quirk: "-W 0" substring-matches digits in coordinates; the
    # whitelist is still collected and must be gated at BED-write time
    # (defineIsoforms.py:113)
    ann3 = parse_annotation(str(g), ["0"])
    assert ann3.polya_whitelist == [("chr1", "+", "900", "T1")]


def test_parse_gene_exons(tmp_path):
    g = tmp_path / "ann.gtf"
    g.write_text(GTF)
    coord = parse_gene_exons(str(g))
    assert "G1_GENE1" in coord["+"]["chr1"][99]   # 0-based start, every 2nt
    assert 100 not in coord["+"]["chr1"]
    assert 101 in coord["+"]["chr1"]
    assert parse_gene_exons("None") == {"+": {}, "-": {}}


def test_sam_to_psl_pooled_matches_serial(tmp_path):
    """Pooled 100k-line-batch SAM->PSL (emtrey.py:154-195 analogue) is
    byte-identical to the serial conversion."""
    import numpy as np

    from mandalorion_tpu.io.sam import sam_to_psl

    rng = np.random.default_rng(2)
    bases = "ACGT"
    sam = tmp_path / "in.sam"
    with open(sam, "w") as fh:
        fh.write("@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100000\n"
                 "@SQ\tSN:chr2\tLN:50000\n")
        for i in range(500):
            seq = "".join(bases[b] for b in rng.integers(0, 4, 60))
            chrom = "chr1" if i % 3 else "chr2"
            pos = int(rng.integers(1, 40_000))
            flag = 16 if i % 5 == 0 else 0
            cigar = "30M5N25M" if i % 2 else "10S40M10S"
            fh.write(f"r{i}\t{flag}\t{chrom}\t{pos}\t60\t{cigar}\t*\t0\t0\t"
                     f"{seq}\t*\tNM:i:2\tcs:Z:={seq[:30]}\n")
        fh.write(f"unmapped\t4\t*\t0\t0\t*\t*\t0\t0\tAAAA\t*\n")
    a = tmp_path / "serial.psl"
    b = tmp_path / "pooled.psl"
    sam_to_psl(str(sam), str(a), mando=True, threads=1)
    sam_to_psl(str(sam), str(b), mando=True, threads=2, batch_lines=37)
    assert a.read_bytes() == b.read_bytes()
    assert sum(1 for _ in open(a)) == 500


def test_scan_record_offsets_and_slice(tmp_path):
    """Byte-offset record addressing for module A's pool workers: the
    scanner's offsets must slice identically to islice on fasta (multi-
    line sequences) and fastq (adversarial '@'-leading quality lines);
    gzip input reports None (no random access)."""
    import gzip
    import numpy as np
    from mandalorion_tpu.io.fastx import (read_fastx, read_fastx_slice,
                                          scan_record_offsets)
    rng = np.random.default_rng(0)
    fa = tmp_path / "x.fa"
    with open(fa, "w") as out:
        for i in range(57):
            seq = "".join(rng.choice(list("ACGT"),
                                     int(rng.integers(1, 300))))
            out.write(f">r{i} extra comment\n")
            for j in range(0, len(seq), 60):
                out.write(seq[j:j + 60] + "\n")
    offs = scan_record_offsets(str(fa))
    full = list(read_fastx(str(fa)))
    assert len(offs) == len(full) == 57
    for lo in (0, 1, 13, 56):
        for cnt in (1, 5, 57):
            assert list(read_fastx_slice(str(fa), offs[lo], cnt)) \
                == full[lo:lo + cnt]

    fq = tmp_path / "x.fq"
    with open(fq, "w") as out:
        for i in range(23):
            seq = "".join(rng.choice(list("ACGT"), 50))
            out.write(f"@q{i} c\n{seq}\n+\n" + "@" + "I" * 49 + "\n")
    offs = scan_record_offsets(str(fq))
    full = list(read_fastx(str(fq)))
    assert len(offs) == len(full) == 23
    for lo in (0, 7, 22):
        assert list(read_fastx_slice(str(fq), offs[lo], 4)) \
            == full[lo:lo + 4]

    gz = tmp_path / "x.fa.gz"
    with gzip.open(gz, "wt") as out:
        out.write(">a\nACGT\n")
    assert scan_record_offsets(str(gz)) is None
    empty = tmp_path / "e.fa"
    empty.write_text("")
    assert scan_record_offsets(str(empty)) == []


def test_scan_record_offsets_chunk_boundaries(tmp_path):
    """Records spanning the scanner's 1 MiB read chunks: offsets must be
    exact when a header straddles two chunks (the pending-tail path)."""
    import numpy as np
    from mandalorion_tpu.io.fastx import (read_fastx, read_fastx_slice,
                                          scan_record_offsets)
    rng = np.random.default_rng(3)
    fa = tmp_path / "big.fa"
    with open(fa, "w") as out:
        for i in range(700):
            seq = "".join(rng.choice(list("ACGT"),
                                     int(rng.integers(2000, 6000))))
            out.write(f">big{i}\n")
            for j in range(0, len(seq), 77):
                out.write(seq[j:j + 77] + "\n")
    assert fa.stat().st_size > 2 * (1 << 20)  # spans >2 scan chunks
    offs = scan_record_offsets(str(fa))
    full = list(read_fastx(str(fa)))
    assert len(offs) == len(full) == 700
    for lo in (0, 349, 699):
        assert list(read_fastx_slice(str(fa), offs[lo], 3)) \
            == full[lo:lo + 3]
