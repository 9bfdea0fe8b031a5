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


def _subsample(reads: Sequence[Tuple[str, str]], cfg: PoaConfig,
               rng: Optional[np.random.Generator]
               ) -> List[Tuple[str, str]]:
    if len(reads) > cfg.max_reads:
        gen = rng if rng is not None else np.random.default_rng(cfg.seed)
        pick = sorted(gen.choice(len(reads), cfg.max_reads, replace=False))
        return [reads[int(i)] for i in pick]
    return list(reads)


def _orient(subsample: Sequence[Tuple[str, str]]
            ) -> Tuple[List[np.ndarray], List[int]]:
    """Orient each read against the first by minimizer-chain strand
    (mappy `map-ont` orientation analogue, SDC.py:895-907)."""
    orienter = OrientationAligner(subsample[0][1])
    oriented: List[np.ndarray] = []
    lengths: List[int] = []
    for _name, seq in subsample:
        lengths.append(len(seq))
        strand = orienter.strand(seq)
        if strand is None:
            continue
        codes = encode(seq)
        oriented.append(codes if strand > 0 else revcomp_codes(codes))
    return oriented, lengths


def determine_consensus(
    reads: Sequence[Tuple[str, str]],
    cfg: Optional[PoaConfig] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[str, List[str]]:
    """Returns (consensus_sequence, ALL read names) — names always cover
    the full read list (reads2isoforms uses them all, SDC.py:880-882)."""
    cfg = cfg or PoaConfig()
    names = [name for name, _ in reads]
    subsample = _subsample(reads, cfg, rng)

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

    oriented, lengths = _orient(subsample)

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

    params = _poa_params(cfg, lengths)
    cons = poa_consensus(oriented, params)
    if len(cons) == 0:
        return _decode(oriented[0]), names  # abPOA empty-output fallback
    return _decode(cons), names


def _poa_params(cfg: PoaConfig, lengths: Sequence[int]) -> PoaParams:
    band = cfg.band_width
    if float(np.median(lengths)) >= cfg.adaptive_band_threshold:
        band = max(band, 256)  # abPOA -S analogue: wider adaptive band
    return PoaParams(match=cfg.match, mismatch=cfg.mismatch,
                     gap_open=cfg.gap_open, gap_extend=cfg.gap_extend,
                     gap_open2=cfg.gap_open2, gap_extend2=cfg.gap_extend2,
                     band=band)


def determine_consensus_batch(
    read_sets: Sequence[Sequence[Tuple[str, str]]],
    cfg: Optional[PoaConfig] = None,
    rng: Optional[np.random.Generator] = None,
) -> List[Tuple[str, List[str]]]:
    """determine_consensus over many isoforms; with the graph engine the
    seq-to-graph DPs are batched into shared device dispatches
    (poa/kernels.py) — the per-locus isoform axis. Results are identical
    to the sequential calls (the kernel is bit-identical to PoaGraph.align
    and the rng is consumed in the same isoform order)."""
    cfg = cfg or PoaConfig()
    if cfg.engine == "star" or len(read_sets) <= 1:
        return [determine_consensus(rs, cfg, rng) for rs in read_sets]
    results: List[Optional[Tuple[str, List[str]]]] = [None] * len(read_sets)
    batch_ids: List[int] = []
    batch_seqs: List[List[np.ndarray]] = []
    batch_params: Optional[PoaParams] = None
    from mandalorion_tpu.poa.graph import MAX_GRAPH_LEN
    from mandalorion_tpu.poa.star import star_consensus
    for i, reads in enumerate(read_sets):
        names = [name for name, _ in reads]
        subsample = _subsample(reads, cfg, rng)  # rng order == sequential
        first_seq = subsample[0][1]
        oriented, lengths = _orient(subsample)
        if not oriented:
            results[i] = (first_seq, names)
        elif len(oriented) <= 2:
            results[i] = (_decode(oriented[0]), names)
        elif max(len(c) for c in oriented) > MAX_GRAPH_LEN:
            cons_str = star_consensus([_decode(c) for c in oriented])
            results[i] = (cons_str or _decode(oriented[0]), names)
        else:
            params = _poa_params(cfg, lengths)
            if batch_params is not None and params != batch_params:
                # band differs (adaptive -S analogue): flush current batch
                _flush_graph_batch(batch_ids, batch_seqs, batch_params,
                                   read_sets, results)
                batch_ids, batch_seqs = [], []
            batch_params = params
            batch_ids.append(i)
            batch_seqs.append(oriented)
    if batch_ids:
        _flush_graph_batch(batch_ids, batch_seqs, batch_params,
                           read_sets, results)
    return results  # type: ignore[return-value]


def _flush_graph_batch(batch_ids, batch_seqs, params, read_sets, results):
    from mandalorion_tpu.poa.kernels import poa_consensus_batch
    consensi = poa_consensus_batch(batch_seqs, params)
    for i, oriented, cons in zip(batch_ids, batch_seqs, consensi):
        names = [name for name, _ in read_sets[i]]
        if len(cons) == 0:
            results[i] = (_decode(oriented[0]), names)
        else:
            results[i] = (_decode(cons), names)
