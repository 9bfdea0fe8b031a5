"""Read-vs-read orientation check (replaces the reference's
`mappy.Aligner(seq=first, preset='map-ont')` strand probe,
SDC.py:895-907): minimizer anchors against a single target read, chained
per strand; the better-scoring orientation wins."""

from __future__ import annotations

from typing import Optional

import numpy as np

from mandalorion_tpu.align.chain import chain_segments, collapse_anchors
from mandalorion_tpu.align.encode import encode, minimizers, revcomp_codes


class OrientationAligner:
    def __init__(self, target_seq: str, kmer: int = 13, window: int = 5):
        self.kmer = kmer
        self.window = window
        codes = encode(target_seq)
        pos, hashes = minimizers(codes, kmer, window)
        order = np.argsort(hashes, kind="stable")
        self.sorted_hashes = hashes[order]
        self.sorted_pos = pos[order]

    def _score(self, codes: np.ndarray) -> float:
        pos, hashes = minimizers(codes, self.kmer, self.window)
        if len(pos) == 0:
            return 0.0
        lo = np.searchsorted(self.sorted_hashes, hashes, "left")
        hi = np.searchsorted(self.sorted_hashes, hashes, "right")
        counts = hi - lo
        keep = (counts > 0) & (counts <= 16)
        if not keep.any():
            return 0.0
        from mandalorion_tpu.align.index import ragged_gather
        q_all, t_all = ragged_gather(self.sorted_pos, lo[keep], hi[keep],
                                     pos[keep])
        segs = collapse_anchors(q_all, t_all, self.kmer)
        _chain, score = chain_segments(segs, min_intron=10 ** 9,
                                       max_intron=10 ** 9)
        return score

    def strand(self, seq: str) -> Optional[int]:
        """+1 forward, -1 reverse, None when no confident hit."""
        codes = encode(seq)
        f = self._score(codes)
        r = self._score(revcomp_codes(codes))
        if f == 0.0 and r == 0.0:
            return None
        return 1 if f >= r else -1
