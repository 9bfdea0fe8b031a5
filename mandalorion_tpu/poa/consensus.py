"""Isoform consensus calling (replaces `determine_consensus`,
SDC.py:876-931).

Per isoform: subsample up to max_reads (SEEDED — the reference's unseeded
np.random.choice permutes even below its cap, making its consensus fasta
nondeterministic; we pin input order for reproducibility, SURVEY §5.9),
orient every read against the first by minimizer-chain strand, then:
<=2 oriented reads -> the first oriented sequence (reference behavior);
otherwise POA consensus over the oriented set.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from mandalorion_tpu.align.encode import encode, revcomp_codes
from mandalorion_tpu.align.pairwise import OrientationAligner
from mandalorion_tpu.config import PoaConfig
from mandalorion_tpu.poa.graph import PoaParams, poa_consensus

from mandalorion_tpu.align.encode import decode as _decode


def determine_consensus(
    reads: Sequence[Tuple[str, str]],
    cfg: Optional[PoaConfig] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[str, List[str]]:
    """Returns (consensus_sequence, ALL read names) — names always cover
    the full read list (reads2isoforms uses them all, SDC.py:880-882)."""
    cfg = cfg or PoaConfig()
    names = [name for name, _ in reads]
    if len(reads) > cfg.max_reads:
        gen = rng if rng is not None else np.random.default_rng(cfg.seed)
        pick = sorted(gen.choice(len(reads), cfg.max_reads, replace=False))
        subsample = [reads[int(i)] for i in pick]
    else:
        subsample = list(reads)

    first_seq = subsample[0][1]

    if cfg.engine == "star":
        # the backbone alignment inside the star engine determines each
        # read's orientation itself (both strands are chained); a separate
        # orientation pass would be redundant work
        if len(subsample) <= 2:
            return first_seq, names
        from mandalorion_tpu.poa.star import star_consensus
        cons_str = star_consensus([seq for _n, seq in subsample])
        if not cons_str:
            return first_seq, names
        return cons_str, names

    orienter = OrientationAligner(first_seq)
    oriented: List[np.ndarray] = []
    lengths: List[int] = []
    for _name, seq in subsample:
        lengths.append(len(seq))
        strand = orienter.strand(seq)
        if strand is None:
            continue
        codes = encode(seq)
        oriented.append(codes if strand > 0 else revcomp_codes(codes))

    if not oriented:
        return first_seq, names
    if len(oriented) <= 2:
        return _decode(oriented[0]), names

    from mandalorion_tpu.poa.graph import MAX_GRAPH_LEN
    if max(len(c) for c in oriented) > MAX_GRAPH_LEN:
        # graph DP memory is O(nodes x len); fall back to the star engine
        # for very long isoforms instead of aborting the locus
        from mandalorion_tpu.poa.star import star_consensus
        cons_str = star_consensus([_decode(c) for c in oriented])
        return (cons_str or _decode(oriented[0])), names

    band = cfg.band_width
    if float(np.median(lengths)) >= cfg.adaptive_band_threshold:
        band = max(band, 256)  # abPOA -S analogue: wider adaptive band
    params = PoaParams(match=cfg.match, mismatch=cfg.mismatch,
                       gap=cfg.gap_extend + cfg.gap_open // 2, band=band)
    cons = poa_consensus(oriented, params)
    if len(cons) == 0:
        return _decode(oriented[0]), names  # abPOA empty-output fallback
    return _decode(cons), names
