"""Gap fill, splice-point search, end extension, and alignment emission.

The chain (align/chain.py) leaves three kinds of work:
- intron gaps (dt - dq >= min_intron): the exact splice point is found with
  a cumulative-match scan over all possible splits plus a canonical-motif
  bonus (GT..AG forward / CT..AC reverse-strand transcripts, -uf semantics)
  — one vectorized O(dq) pass, no DP;
- small indel gaps: global affine-gap DP;
- read-end tails: extension (semi-global) affine DP with best-cell stop.

DP problems are collected per batch and solved through a pluggable backend
(numpy here; the Pallas TPU kernel in align/kernels.py solves the same
problem layout), then ops are stitched and emitted as extended PSL.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from mandalorion_tpu.config import AlignConfig

# op codes: (kind, q0, t0, length) — kind M diagonal run / I insert /
# D delete / N intron
BASES = "ACGT"


@dataclass
class DpProblem:
    """One pairwise DP sub-problem over uint8 code arrays."""

    q: np.ndarray
    t: np.ndarray
    mode: str  # 'global' | 'extend'


@dataclass
class DpResult:
    ops: List[Tuple[str, int, int]]  # (op, q_advance, t_advance) runs
    q_len: int                       # query consumed (extend mode)
    t_len: int


def solve_dp_numpy(problems: Sequence[DpProblem],
                   cfg: AlignConfig) -> List[DpResult]:
    """Reference DP backend: affine-gap alignment, row-vectorized numpy.
    Serves as the oracle for the Pallas kernel (tests/test_kernels.py)."""
    return [_solve_one(p, cfg) for p in problems]


def _solve_one(p: DpProblem, cfg: AlignConfig) -> DpResult:
    """Gotoh affine-gap DP with full three-state traceback.
    States: H (match), E (gap in target, consumes query = insertion),
    F (gap in query, consumes target = deletion)."""
    nq, nt = len(p.q), len(p.t)
    # fast path: an extension whose query is an exact prefix of the target
    # is optimally all-match (any other path scores lower) — the common
    # case for clean read ends
    if p.mode != "global" and 0 < nq <= nt and np.array_equal(
            p.q, p.t[:nq]):
        return DpResult([("M", nq, nq)], nq, nq)
    if nq == 0 and nt == 0:
        return DpResult([], 0, 0)
    if nq == 0:
        return (DpResult([("D", 0, nt)], 0, nt) if p.mode == "global"
                else DpResult([], 0, 0))
    if nt == 0:
        return (DpResult([("I", nq, 0)], nq, 0) if p.mode == "global"
                else DpResult([], 0, 0))

    match, mis = cfg.match, -cfg.mismatch
    go, ge = cfg.gap_open, cfg.gap_extend
    NEG = -(10 ** 9)

    H = np.full((nq + 1, nt + 1), NEG, np.int64)
    E = np.full((nq + 1, nt + 1), NEG, np.int64)
    F = np.full((nq + 1, nt + 1), NEG, np.int64)
    ptrH = np.zeros((nq + 1, nt + 1), np.uint8)  # 0 diag, 1 E, 2 F
    ptrE = np.zeros((nq + 1, nt + 1), np.uint8)  # 0 open, 1 extend
    ptrF = np.zeros((nq + 1, nt + 1), np.uint8)
    H[0, 0] = 0
    F[0, 1:] = -(go + ge * np.arange(1, nt + 1))
    ptrF[0, 2:] = 1
    H[0, 1:] = F[0, 1:]
    ptrH[0, 1:] = 2
    sub = np.where(p.q[:, None] == p.t[None, :], match, mis).astype(np.int64)

    for i in range(1, nq + 1):
        # E (vertical, query-consuming) — fully vectorized over j
        open_e = H[i - 1] - go - ge
        ext_e = E[i - 1] - ge
        E[i] = np.maximum(open_e, ext_e)
        ptrE[i] = (ext_e > open_e).astype(np.uint8)
        H[i, 0] = E[i, 0]
        ptrH[i, 0] = 1
        diag = H[i - 1, :-1] + sub[i - 1]
        # F has the in-row dependency: scalar scan
        f = NEG
        hrow = H[i]
        for j in range(1, nt + 1):
            open_f = hrow[j - 1] - go - ge
            ext_f = f - ge
            if ext_f > open_f:
                f = ext_f
                ptrF[i, j] = 1
            else:
                f = open_f
            F[i, j] = f
            h = diag[j - 1]
            code = 0
            if E[i, j] > h:
                h = E[i, j]
                code = 1
            if f > h:
                h = f
                code = 2
            hrow[j] = h
            ptrH[i, j] = code

    if p.mode == "global":
        qi, tj = nq, nt
    else:
        # end_bonus: reward consuming the whole query, so real read tails
        # align through trailing mismatches instead of soft-clipping
        eff = H if cfg.end_bonus == 0 else H.copy()
        if cfg.end_bonus:
            eff[nq, :] += cfg.end_bonus
        flat = int(np.argmax(eff))
        qi, tj = divmod(flat, nt + 1)
        if eff[qi, tj] <= 0:
            return DpResult([], 0, 0)

    ops: List[Tuple[str, int, int]] = []
    i, j = qi, tj
    state = "H"
    while i > 0 or j > 0:
        if state == "H":
            code = ptrH[i, j]
            if code == 0 and i > 0 and j > 0:
                ops.append(("M", 1, 1))
                i -= 1
                j -= 1
            elif code == 1:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            ops.append(("I", 1, 0))
            state = "E" if ptrE[i, j] else "H"
            i -= 1
        else:
            ops.append(("D", 0, 1))
            state = "F" if ptrF[i, j] else "H"
            j -= 1
    ops.reverse()
    merged: List[Tuple[str, int, int]] = []
    for op, dq, dt in ops:
        if merged and merged[-1][0] == op:
            merged[-1] = (op, merged[-1][1] + dq, merged[-1][2] + dt)
        else:
            merged.append((op, dq, dt))
    return DpResult(merged, qi, tj)


def splice_fill(q: np.ndarray, t_left: np.ndarray, t_right: np.ndarray,
                donor_codes: np.ndarray, acceptor_codes: np.ndarray,
                strand: str, noncanonical_penalty: int
                ) -> Tuple[int, int]:
    """Choose the splice split s in [0, dq]: q[:s] aligns before the intron,
    q[s:] after. donor_codes[s] = 2-mer code id at intron start for split s;
    acceptor_codes[s] = 2-mer at intron end. Returns (s, matches)."""
    dq = len(q)
    eq_l = (q == t_left[:dq]).astype(np.int32) if dq else np.zeros(0, np.int32)
    eq_r = (q == t_right[-dq:]).astype(np.int32) if dq else np.zeros(0, np.int32)
    cum_l = np.zeros(dq + 1, np.int32)
    np.cumsum(eq_l, out=cum_l[1:])
    cum_r = np.zeros(dq + 1, np.int32)
    np.cumsum(eq_r[::-1], out=cum_r[1:])
    sum_r = cum_r[::-1]  # matches in q[s:] aligned right
    if strand == "+":
        want_d, want_a = (2, 3), (0, 2)        # GT ... AG
    else:
        want_d, want_a = (1, 3), (0, 1)        # CT ... AC
    canon = ((donor_codes[:, 0] == want_d[0])
             & (donor_codes[:, 1] == want_d[1])
             & (acceptor_codes[:, 0] == want_a[0])
             & (acceptor_codes[:, 1] == want_a[1]))
    score = cum_l + sum_r + np.where(canon, noncanonical_penalty, 0)
    s = int(np.argmax(score))
    return s, int(cum_l[s] + sum_r[s])
