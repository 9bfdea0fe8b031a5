"""PSL cleaning (small-gap merging) and locus splitting.

Behavioral equivalents of `SpliceDefineConsensus.clean_psl` (SDC.py:14-93)
and `SpliceDefineConsensus.get_chromosomes` (SDC.py:442-495):

- clean_psl merges alignment gaps < minimum_intron_size (10) into their
  flanking blocks (the gap bases count as aligned), keeps gaps >= 10 as
  introns, and RECOMPUTES qStarts as qStart + cumulative cleaned block sizes
  — deliberately dropping read-insertion offsets (probed quirk, SURVEY §5.9).
  With primary=True only the first alignment per read name is kept.
- split_loci streams a sorted PSL and starts a new locus when the chromosome
  changes or start > previous_end (overlap chaining).
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Tuple

from mandalorion_tpu.io.psl import PslRecord, parse_psl_line, format_psl


def merge_small_gaps(sizes: List[int], starts: List[int], t_start: int,
                     q_start: int, minimum_intron_size: int
                     ) -> Tuple[List[int], List[int], List[int]]:
    """The clean_psl core: merge sub-intron gaps into blocks and recompute
    qStarts cumulatively (dropping insertion offsets, the probed quirk).
    Returns (sizes, q_starts, t_starts). Single source of truth for
    clean_record and clean_sort_split."""
    merged = 0
    pending: List[Tuple[int, int]] = []  # (merged_block_size, following_gap)
    for i, size in enumerate(sizes):
        merged += size
        if i + 1 < len(sizes):
            gap = starts[i + 1] - (starts[i] + size)
            if gap < minimum_intron_size:
                merged += gap
            else:
                pending.append((merged, gap))
                merged = 0
    new_sizes: List[int] = []
    new_tstarts: List[int] = []
    new_qstarts: List[int] = []
    t_pos = t_start
    q_pos = q_start
    for block, gap in pending:
        new_tstarts.append(t_pos)
        new_sizes.append(block)
        new_qstarts.append(q_pos)
        t_pos += block + gap
        q_pos += block
    new_tstarts.append(t_pos)
    new_sizes.append(merged)
    new_qstarts.append(q_pos)
    return new_sizes, new_qstarts, new_tstarts


def clean_record(rec: PslRecord, minimum_intron_size: int = 10) -> PslRecord:
    """Merge sub-intron gaps into blocks; recompute qStarts cumulatively."""
    ns, nq, nt = merge_small_gaps(rec.block_sizes, rec.t_starts,
                                  rec.t_start, rec.q_start,
                                  minimum_intron_size)
    out = PslRecord(**{**rec.__dict__})
    out.block_count = len(ns)
    out.block_sizes = ns
    out.q_starts = nq
    out.t_starts = nt
    return out


def clean_psl_file(psl_path: str, out_path: str, primary: bool,
                   minimum_intron_size: int = 10) -> None:
    """File-level clean_psl with first-alignment-per-name dedup."""
    used = set()
    with open(psl_path) as fh, open(out_path, "w") as out:
        for line in fh:
            if not line.strip():
                continue
            rec = parse_psl_line(line)
            if primary and rec.q_name in used:
                continue
            out.write(format_psl(clean_record(rec, minimum_intron_size)) + "\n")
            used.add(rec.q_name)


def iter_loci(lines: Iterable[str]) -> Iterator[Tuple[str, int, int, List[str]]]:
    """Group sorted PSL lines into loci. Yields (chrom, start, end, lines).

    A new locus starts when the chromosome changes or start > previous_end;
    previous_end grows to max(end, previous_end) within a locus
    (SDC.py:442-495, including the v4.0.0 first-read fix at :479).
    """
    reads: List[str] = []
    prev_chrom = ""
    prev_start = 0
    prev_end = 0
    for line in lines:
        if not line.strip():
            continue
        a = line.split("\t", 17)
        chrom = a[13]
        start = int(a[15])
        end = int(a[16])
        if chrom != prev_chrom or start > prev_end:
            if reads:
                yield prev_chrom, prev_start, prev_end, reads
            reads = [line]
            prev_chrom = chrom
            prev_start = start
            prev_end = end
        else:
            prev_end = max(end, prev_end)
            reads.append(line)
    if reads:
        yield prev_chrom, prev_start, prev_end, reads


def split_loci(sorted_psl_path: str, out_dir: str) -> Dict[str, str]:
    """Write one `<chrom>~<start>~<end>.psl` per locus (locus PSL contract,
    SURVEY §2.4). Returns read_name -> locus_root."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    read_to_root: Dict[str, str] = {}
    with open(sorted_psl_path) as fh:
        for chrom, start, end, lines in iter_loci(fh):
            root = f"{chrom}~{start}~{end}"
            with open(os.path.join(out_dir, root + ".psl"), "w") as out:
                for line in lines:
                    out.write(line)
                    read_to_root[line.split("\t", 10)[9]] = root
    return read_to_root


def clean_sort_split(psl_path: str, clean_path: str, sorted_path: str,
                     out_dir: str, minimum_intron_size: int = 10
                     ) -> Dict[str, str]:
    """One-pass module P: parse each alignment once, clean it, then write
    all three stage artifacts (clean, clean.sorted, per-locus files) from
    the in-memory lines — the -M resume contract unchanged, the extended
    PSL (long lines carry read sequences) parsed only once."""
    import os

    used = set()
    # decorate-sort-undecorate: each entry is (chrom, tStart, line, tEnd,
    # name) so the sort needs no key function and the locus split no
    # re-parse. Natural tuple order == psl_sort_key's GNU `sort -k 14,14
    # -k 16,17n` C-collation order: UTF-8 encoding preserves codepoint
    # order, so comparing the str chrom/line equals comparing their
    # bytes; tEnd/name only break ties between IDENTICAL lines, where
    # any order is the same output.
    cleaned: List[tuple] = []
    with open(psl_path) as fh, open(clean_path, "w") as out:
        buf: List[str] = []
        for line in fh:
            if not line.strip():
                continue
            # cleaning only rewrites cols 17-20; surgical splice avoids a
            # full record parse/format round-trip on the long lines, and
            # maxsplit leaves the long tail (cs + sequence) unscanned
            a = line.rstrip("\n").split("\t", 21)
            name = a[9]
            if name in used:  # primary only
                continue
            used.add(name)
            sizes = [int(x) for x in a[18].split(",")[:-1]]
            starts = [int(x) for x in a[20].split(",")[:-1]]
            ns, nq, nt = merge_small_gaps(sizes, starts, int(a[15]),
                                          int(a[11]), minimum_intron_size)
            a[17] = str(len(ns))
            a[18] = ",".join(map(str, ns)) + ","
            a[19] = ",".join(map(str, nq)) + ","
            a[20] = ",".join(map(str, nt)) + ","
            out_line = "\t".join(a) + "\n"
            cleaned.append((a[13], int(a[15]), out_line, int(a[16]), name))
            buf.append(out_line)
            if len(buf) == 4096:  # chunked writes: IO-bound stage
                out.write("".join(buf))
                buf = []
        if buf:
            out.write("".join(buf))
    cleaned.sort()
    with open(sorted_path, "w") as out:
        out.writelines(entry[2] for entry in cleaned)
    os.makedirs(out_dir, exist_ok=True)
    read_to_root: Dict[str, str] = {}
    # locus grouping on the carried (chrom, tStart, tEnd): a new locus
    # when the chromosome changes or start > previous_end, previous_end
    # growing to max(end, previous_end) — exactly iter_loci's rule
    # (SDC.py:442-495 incl. the v4.0.0 first-read fix)
    i = 0
    n_entries = len(cleaned)
    while i < n_entries:
        chrom, start, _line, end, _name = cleaned[i]
        j = i + 1
        while j < n_entries:
            c2, s2, _l2, e2, _n2 = cleaned[j]
            if c2 != chrom or s2 > end:
                break
            end = max(end, e2)
            j += 1
        root = f"{chrom}~{start}~{end}"
        with open(os.path.join(out_dir, root + ".psl"), "w") as out:
            out.write("".join(cleaned[k][2] for k in range(i, j)))
        for k in range(i, j):
            read_to_root[cleaned[k][4]] = root
        i = j
    return read_to_root


def discover_loci(out_dir: str) -> List[str]:
    """Re-discover locus roots from a tmp_SS directory, sorted by
    (chrom, start) like `defineIsoforms.py:126`."""
    import os

    roots = []
    for f in os.listdir(out_dir):
        if f.endswith(".psl") and os.path.isfile(os.path.join(out_dir, f)):
            roots.append(f[:-len(".psl")])
    return sorted(roots, key=lambda r: (r.split("~")[0], int(r.split("~")[1])))
