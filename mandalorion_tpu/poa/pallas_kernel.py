"""Pallas TPU forward pass for the batched seq-to-graph POA DP.

The XLA `fori_loop` form of the graph DP (poa/kernels.py `_align_rows`)
costs ~50 us per problem-row on a v5e — each row is a handful of
(1, W<=2048)-lane vector ops plus a few dynamic row reads, so the loop is
pure per-iteration overhead, and it does NOT amortize with batch size
(measured r4: B=16 -> 3.8 s, B=61 -> 14.5 s for one 4096-row round).
This kernel compiles the whole row loop into one Mosaic program, exactly
like the aligner's Pallas DP (align/kernels.py): grid = (batch tiles,
rank rows), DP state in VMEM scratch, each row's PACKED traceback inputs
(hpack/opack/d1p/d2p + offs/endcol — score/d1/d2 never leave the chip)
streamed to HBM for the (shared) XLA traceback to walk.

Graph-DP-specific parts:
- predecessor rows live in a K-deep circular VMEM window per problem
  (reads `h_ring[t*K + (pred_rank & (K-1))]` — dynamic sublane reads are
  legal in Mosaic); the host gates dispatch on the graph's maximum
  predecessor back-distance <= K-1 and falls back to the XLA path
  otherwise (virtual-source reads are served from a dedicated row-0
  scratch, so rank-0 restarts never age out of the ring);
- window realignment between a predecessor row's band offset and the
  current row's (the `shifted` read in `_align_rows`) is a dynamic LANE
  shift, which Mosaic only allows 128-aligned — so it is done as a
  `pltpu.roll` of a NEG-extended row followed by a static slice, with the
  exact `ok` bounds mask applied on top (wrap-around values never leak);
- the adaptive (-S) band center needs the best-column of the best
  predecessor row: per-row `bestc`/`offs` scalars live in K-lane rings
  read by small rolls.

Bit-identical contract: produces the same packed traceback matrices,
offsets, and therefore the same traceback paths as `_align_rows`
(tests/test_poa_pallas.py asserts consensus equality on randomized graphs
via interpret mode; the TPU build is additionally spot-checked on
hardware). Adaptive banding only — the production banding model
(PoaParams.adaptive, NOTES r3); static-band calls use the XLA path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mandalorion_tpu.poa.graph import NEG

TILE = 8              # problems per grid tile (Mosaic sublane alignment)
LANE = 128
_RING_BYTES = 6 * 1024 * 1024   # VMEM budget for the 3 state rings


def ring_depth(W: int) -> int:
    """Predecessor-window depth for a given banded width (pow2)."""
    k = 1
    while 3 * TILE * (2 * k) * W * 4 <= _RING_BYTES:
        k *= 2
    return k


def _row_slot(p_cap: int) -> int:
    """Lanes per problem in the packed rowdata block: p_cap preds + the
    base code, pow2 so a TILE of problems tiles the 128-lane dim exactly
    (16 lanes x 8 problems for the common p_cap <= 15). The former
    (n_cap+1, B, 128) layout spent 128 lanes on p_cap+1 values and its
    ~21 MB host->device transfer per round dominated the forward's wall
    time through the tunnel."""
    s = 16
    while s < p_cap + 1:
        s *= 2
    return s


def _cummax_lane(x):
    """Inclusive prefix max along the lane axis (doubling rolls)."""
    n = x.shape[-1]
    jidx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    d = 1
    while d < n:
        rolled = pltpu.roll(x, shift=d, axis=x.ndim - 1)
        x = jnp.maximum(x, jnp.where(jidx >= d, rolled, NEG))
        d *= 2
    return x


def _shift_right_fill(x, fill):
    """out[..., e] = x[..., e-1]; out[..., 0] = fill (a traced scalar)."""
    jidx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    rolled = pltpu.roll(x, shift=1, axis=x.ndim - 1)
    return jnp.where(jidx >= 1, rolled, fill)


def _dyn_window(row_ext, rel0, W):
    """(1, 3W) NEG-extended row -> (1, W) window starting at rel0
    (out[e] = row[rel0 + e]; any wrap-around is masked by the caller's
    `ok` bounds check)."""
    sh = jnp.mod(-rel0, 3 * W)
    return pltpu.roll(row_ext, shift=sh, axis=1)[:, :W]


def _poa_fwd_kernel(meta_ref, rowdata_ref, q_ref,
                    hpack_ref, opack_ref, d1p_ref, d2p_ref, offsb_ref,
                    h_ring, d1_ring, d2_ring, offs_ring, bestc_ring,
                    row0_scr,
                    *, match, mismatch, o1, e1, o2, e2, band, W, K,
                    p_cap):
    """Cross-problem vectorized row step (VERDICT r4 #2): only the
    genuinely per-problem work — the dynamic predecessor-window reads and
    the adaptive band-center scalars — runs in the serial TILE loop; the
    H pass, both convex insertion prefix-max scans, the band masks, and
    every matrix/ring store run ONCE on stacked (TILE, W) arrays, so the
    heavy tail of each row uses all 8 sublanes instead of 1. The rings
    are slot-major ((K*TILE, W), row = slot*TILE + t) so the three ring
    updates are one dynamic-leading store each."""
    i = pl.program_id(0)                      # batch tile
    j = pl.program_id(1)                      # matrix row (0 = boundary)
    n_hi = meta_ref[0, 2]                     # batch-max node count
    cidx = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    neg_row = jnp.full((1, W), NEG, jnp.int32)
    neg_tile = jnp.full((TILE, W), NEG, jnp.int32)
    qlen_col = meta_ref[pl.ds(i * TILE, TILE), :][:, 1:2]   # (TILE, 1)
    SLOT = _row_slot(p_cap)   # lanes per problem in the packed rowdata

    @pl.when(j == 0)
    def _init():
        g0 = -jnp.minimum(o1 + e1 * cidx, o2 + e2 * cidx)   # (1, W)
        g0 = jnp.where(cidx == 0, 0, g0)
        g0 = jnp.where(cidx > jnp.minimum(qlen_col, band), NEG,
                       g0)                                   # (TILE, W)
        # row 0 packed: op=1, op0=0, node0=-2 -> hpack 1; origs 0
        hpack_ref[0] = jnp.ones((TILE, W), jnp.int32)
        opack_ref[0] = jnp.zeros((TILE, W), jnp.int32)
        d1p_ref[0] = jnp.zeros((TILE, W), jnp.int32)
        d2p_ref[0] = jnp.zeros((TILE, W), jnp.int32)
        lidx0 = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANE), 1)
        end0 = jnp.max(jnp.where(cidx == qlen_col, g0, NEG), axis=1,
                       keepdims=True)
        offsb_ref[0] = jnp.where(lidx0 == 1, end0, 0)
        row0_scr[:, :] = g0
        h_ring[0:TILE, :] = g0                # slot 0 rows
        d1_ring[0:TILE, :] = neg_tile
        d2_ring[0:TILE, :] = neg_tile
        offs_ring[:, :] = jnp.zeros((TILE, K), jnp.int32)
        bestc_ring[:, :] = jnp.zeros((TILE, K), jnp.int32)

    @pl.when((j > 0) & (j <= n_hi))
    def _row():
        slot = j & (K - 1)
        kidx = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        off_l, center_l, sub_l, diag_l, rank_l, d1_l, d2_l = \
            [], [], [], [], [], [], []
        d1p_l, d2p_l = [], []
        for t in range(TILE):
            qlen = qlen_col[t, 0]
            base_v = rowdata_ref[0, i, t * SLOT + p_cap]

            # ---- adaptive band center: best pred row's first-max col + 1
            c = jnp.int32(NEG)
            for p in range(p_cap):
                pr = rowdata_ref[0, i, t * SLOT + p]
                prc = jnp.maximum(pr, 0)
                bc_row = bestc_ring[t:t + 1, :]
                bc = pltpu.roll(bc_row, shift=jnp.mod(
                    -(prc & (K - 1)), K), axis=1)[0, 0]
                bc = jnp.where(prc == 0, 0, bc)
                c = jnp.maximum(c, jnp.where(pr >= 0, bc, NEG))
            center = c + 1
            off = jnp.clip(center - band, 0,
                           jnp.maximum(0, qlen + 1 - W))
            off_l.append(jnp.reshape(off, (1, 1)))
            center_l.append(jnp.reshape(center, (1, 1)))

            # query window: qm1[e] = q[jabs[e] - 1] via q_ext roll
            q_row = q_ref[pl.ds(i * TILE + t, 1), :]
            LQ = q_row.shape[1]
            qm1 = pltpu.roll(q_row, shift=jnp.mod(-off, LQ),
                             axis=1)[:, :W]
            sub_l.append(jnp.where(qm1 == base_v, match, -mismatch
                                   ).astype(jnp.int32))

            # ---- predecessor reads (per-problem dynamic windows)
            best_diag = neg_row
            rank_diag = jnp.full((1, W), -2, jnp.int32)
            d1_row = neg_row
            d2_row = neg_row
            d1_ptr = jnp.zeros((1, W), jnp.int32)
            d2_ptr = jnp.zeros((1, W), jnp.int32)
            for p in range(p_cap):
                pr = rowdata_ref[0, i, t * SLOT + p]
                prc = jnp.maximum(pr, 0)
                pslot = prc & (K - 1)
                off_row = offs_ring[t:t + 1, :]
                off_p = pltpu.roll(off_row, shift=jnp.mod(
                    -pslot, K), axis=1)[0, 0]
                off_p = jnp.where(prc == 0, 0, off_p)
                rel0 = off - 1 - off_p

                is0 = prc == 0
                h_row = jnp.where(
                    is0, row0_scr[t:t + 1, :],
                    h_ring[pl.ds(pslot * TILE + t, 1), :])
                d1p_row = jnp.where(
                    is0, neg_row,
                    d1_ring[pl.ds(pslot * TILE + t, 1), :])
                d2p_row = jnp.where(
                    is0, neg_row,
                    d2_ring[pl.ds(pslot * TILE + t, 1), :])

                ext_h = jnp.concatenate([h_row, neg_row, neg_row], axis=1)
                ext_d1 = jnp.concatenate([d1p_row, neg_row, neg_row],
                                         axis=1)
                ext_d2 = jnp.concatenate([d2p_row, neg_row, neg_row],
                                         axis=1)

                # one roll serves BOTH windows: the diag window starts at
                # rel0 (static slice [:W]) and the next window at rel0+1
                # (static slice [1:W+1]) of the same rolled row
                eabs_d = (off - 1) + cidx
                ok_d = ((pr >= 0) & (rel0 + cidx >= 0)
                        & (rel0 + cidx < W) & (eabs_d >= 0))
                ok_n = ((pr >= 0) & (rel0 + 1 + cidx >= 0)
                        & (rel0 + 1 + cidx < W))
                sh = jnp.mod(-rel0, 3 * W)
                roll_h = pltpu.roll(ext_h, shift=sh, axis=1)
                roll_d1 = pltpu.roll(ext_d1, shift=sh, axis=1)
                roll_d2 = pltpu.roll(ext_d2, shift=sh, axis=1)
                w_diag = jnp.where(ok_d, roll_h[:, :W], NEG)
                w_h = jnp.where(ok_n, roll_h[:, 1:W + 1], NEG)
                w_d1 = jnp.where(ok_n, roll_d1[:, 1:W + 1], NEG)
                w_d2 = jnp.where(ok_n, roll_d2[:, 1:W + 1], NEG)

                better = w_diag > best_diag
                best_diag = jnp.where(better, w_diag, best_diag)
                rank_diag = jnp.where(better, pr, rank_diag)
                # D backpointers: (first-max pred row << 1) | ext, same
                # strict-> rule as the XLA forward (_align_rows)
                c1_open = w_h - (o1 + e1)
                c1_ext = w_d1 - e1
                c1 = jnp.maximum(c1_open, c1_ext)
                b1 = c1 > d1_row
                d1_ptr = jnp.where(
                    b1, (pr << 1) | (c1_ext > c1_open), d1_ptr)
                d1_row = jnp.where(b1, c1, d1_row)
                c2_open = w_h - (o2 + e2)
                c2_ext = w_d2 - e2
                c2 = jnp.maximum(c2_open, c2_ext)
                b2 = c2 > d2_row
                d2_ptr = jnp.where(
                    b2, (pr << 1) | (c2_ext > c2_open), d2_ptr)
                d2_row = jnp.where(b2, c2, d2_row)
            diag_l.append(best_diag)
            rank_l.append(rank_diag)
            d1_l.append(d1_row)
            d2_l.append(d2_row)
            d1p_l.append(d1_ptr)
            d2p_l.append(d2_ptr)

        # ---- stacked (TILE, W): everything below runs once per row
        off_col = jnp.concatenate(off_l, axis=0)        # (TILE, 1)
        center_col = jnp.concatenate(center_l, axis=0)  # (TILE, 1)
        sub = jnp.concatenate(sub_l, axis=0)
        best_diag = jnp.concatenate(diag_l, axis=0)
        rank_diag = jnp.concatenate(rank_l, axis=0)
        d1_row = jnp.concatenate(d1_l, axis=0)
        d2_row = jnp.concatenate(d2_l, axis=0)
        d1_ptr = jnp.concatenate(d1p_l, axis=0)
        d2_ptr = jnp.concatenate(d2p_l, axis=0)
        jabs = off_col + cidx
        j0 = jnp.maximum(0, center_col - band)
        j1 = jnp.minimum(qlen_col, center_col + band)
        masked = (jabs < j0) | (jabs > j1)
        d1_row = jnp.where(masked, NEG, d1_row)
        d2_row = jnp.where(masked, NEG, d2_row)

        # ---- H pre-insertion: diag >= D1 >= D2 on ties
        row = jnp.where(jabs == 0, NEG, best_diag + sub)
        rowo = jnp.zeros((TILE, W), jnp.int32)
        rown = jnp.where(jabs == 0, -2, rank_diag)
        m = d1_row > row
        row = jnp.where(m, d1_row, row)
        rowo = jnp.where(m, 2, rowo)
        m = d2_row > row
        row = jnp.where(m, d2_row, row)
        rowo = jnp.where(m, 4, rowo)
        row = jnp.where(masked, NEG, row)

        # ---- convex insertions via prefix-max scans
        fin = row
        fino = rowo
        org_out = []
        for oo, ee, code in ((o1, e1, 1), (o2, e2, 3)):
            vals = row + ee * jabs
            acc_c = jnp.where(off_col > 0, NEG + ee * (off_col - 1),
                              jnp.int32(NEG - 1))
            if ee > 0:
                org_c = jnp.where(off_col > 0, off_col - 1, -1)
            else:
                org_c = jnp.where(off_col > 0, 0, -1)
            acc = jnp.maximum(_cummax_lane(vals), acc_c)
            prev_acc = _shift_right_fill(acc, acc_c)
            is_new = vals > prev_acc
            org = jnp.maximum(
                _cummax_lane(jnp.where(is_new, jabs, -1)), org_c)
            ins = acc - oo - ee * jabs
            m = ins > fin
            fin = jnp.where(m, ins, fin)
            fino = jnp.where(m, code, fino)
            org_out.append(jnp.where(m, org, 0))
        fin = jnp.where(masked, NEG, fin)

        # ---- stream the row out (packed walk inputs ONLY — score/d1/d2
        # live in the VMEM rings and never leave the chip) + update rings
        hpack_ref[0] = fino | (rowo << 3) | ((rown + 2) << 6)
        opack_ref[0] = org_out[0] | (org_out[1] << 16)
        d1p_ref[0] = d1_ptr
        d2p_ref[0] = d2_ptr
        endv = jnp.max(jnp.where(jabs == qlen_col, fin, NEG), axis=1,
                       keepdims=True)
        lidx = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANE), 1)
        offsb_ref[0] = jnp.where(lidx == 0, off_col,
                                 jnp.where(lidx == 1, endv, 0))

        h_ring[pl.ds(slot * TILE, TILE), :] = fin
        d1_ring[pl.ds(slot * TILE, TILE), :] = d1_row
        d2_ring[pl.ds(slot * TILE, TILE), :] = d2_row
        row_best = jnp.max(fin, axis=1, keepdims=True)      # (TILE, 1)
        bcol = jnp.where(
            row_best <= NEG, 0,
            off_col + jnp.min(jnp.where(fin == row_best, cidx, W),
                              axis=1, keepdims=True))
        for t in range(TILE):
            offs_ring[t, :] = jnp.where(kidx == slot, off_col[t, 0],
                                        offs_ring[t:t + 1, :])[0]
            bestc_ring[t, :] = jnp.where(kidx == slot, bcol[t, 0],
                                         bestc_ring[t:t + 1, :])[0]

    @pl.when(j > n_hi)
    def _inert():
        # rows past the batch's max node count keep init-pattern values
        # (the XLA path never writes them either); endcol lane NEG so
        # the end-rank argmax can never pick an inert row
        hpack_ref[0] = jnp.zeros((TILE, W), jnp.int32)
        opack_ref[0] = jnp.zeros((TILE, W), jnp.int32)
        d1p_ref[0] = jnp.zeros((TILE, W), jnp.int32)
        d2p_ref[0] = jnp.zeros((TILE, W), jnp.int32)
        lidx = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANE), 1)
        offsb_ref[0] = jnp.where(lidx == 1, NEG, 0)


@functools.lru_cache(maxsize=32)
def _poa_fwd_fn(match, mismatch, o1, e1, o2, e2, band, W, B, n_cap,
                p_cap, lq, interpret):
    K = ring_depth(W)
    assert B % TILE == 0
    kernel = functools.partial(
        _poa_fwd_kernel, match=match, mismatch=mismatch, o1=o1, e1=e1,
        o2=o2, e2=e2, band=band, W=W, K=K, p_cap=p_cap)
    mats = [jax.ShapeDtypeStruct((n_cap + 1, B, W), jnp.int32)
            for _ in range(4)]
    fn = pl.pallas_call(
        kernel,
        grid=(B // TILE, n_cap + 1),
        in_specs=[
            pl.BlockSpec((B, LANE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),          # meta
            pl.BlockSpec((1, B // TILE, TILE * _row_slot(p_cap)),
                         lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),          # rowdata
                         # (host shifts rowdata one row down: block j
                         # holds graph row j-1; row 0 is a dummy; lanes
                         # pack TILE problems x _row_slot values)
            pl.BlockSpec((B, lq), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),          # q_ext
        ],
        out_specs=[pl.BlockSpec((1, TILE, W), lambda i, j: (j, i, 0),
                                memory_space=pltpu.VMEM)
                   for _ in range(4)]
        + [pl.BlockSpec((1, TILE, LANE), lambda i, j: (j, i, 0),
                        memory_space=pltpu.VMEM)],
        out_shape=mats + [jax.ShapeDtypeStruct((n_cap + 1, B, LANE),
                                               jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((TILE * K, W), jnp.int32),   # h_ring
            pltpu.VMEM((TILE * K, W), jnp.int32),   # d1_ring
            pltpu.VMEM((TILE * K, W), jnp.int32),   # d2_ring
            pltpu.VMEM((TILE, K), jnp.int32),       # offs_ring
            pltpu.VMEM((TILE, K), jnp.int32),       # bestc_ring
            pltpu.VMEM((TILE, W), jnp.int32),       # row0
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def max_back_distance(preds_r: np.ndarray, n_nodes: int) -> int:
    """Largest (row - predecessor_row) over real predecessors (the
    virtual source row 0 is excluded — the kernel serves it from a
    dedicated scratch, so rank-0 restarts never constrain the ring)."""
    rows = np.arange(1, n_nodes + 1)[:, None]
    pr = preds_r[:n_nodes].astype(np.int64)
    back = np.where(pr >= 1, rows - pr, 0)
    return int(back.max(initial=0))


def poa_forward_pallas(base, preds, nn, qq, ql, n_hi: int,
                       match, mismatch, o1, e1, o2, e2, band, W,
                       interpret: bool = False):
    """Batched forward pass. Inputs: base (B, n_cap), preds (B, n_cap,
    p_cap), nn (B,), qq (B, l_cap), ql (B,). Returns the traceback's
    packed inputs ONLY — (hpack, opack, d1p, d2p) in ROW-major layout
    (n_cap+1, B, W) plus offs and endcol (n_cap+1, B) — the same values
    as vmapped `_align_rows` with the batch axis second. score/d1/d2
    live in the kernel's VMEM rings and never stream to HBM."""
    B, n_cap = base.shape
    p_cap = preds.shape[2]
    l_cap = qq.shape[1]
    # pad batch to a tile multiple (inert rows: nn=0, ql=0)
    Bp = -(-B // TILE) * TILE
    if Bp != B:
        pad = Bp - B
        base = np.concatenate([base, np.zeros((pad, n_cap), np.int32)])
        preds = np.concatenate(
            [preds, np.full((pad, n_cap, p_cap), -1, np.int32)])
        nn = np.concatenate([nn, np.zeros(pad, np.int32)])
        qq = np.concatenate([qq, np.zeros((pad, l_cap), np.int32)])
        ql = np.concatenate([ql, np.zeros(pad, np.int32)])
    meta = np.zeros((Bp, LANE), np.int32)
    meta[:, 0] = nn
    meta[:, 1] = ql
    meta[:, 2] = n_hi
    # rowdata: per-row preds + base in one streamed block, shifted one
    # row down so grid row j reads graph row j-1 with an identity index
    # map (row 0 is a dummy). TILE problems pack the lane dim (_row_slot
    # lanes each) so the per-round transfer is ~8x smaller than one
    # 128-lane row per problem
    SLOT = _row_slot(p_cap)
    G = Bp // TILE
    rowdata = np.full((n_cap + 1, G, TILE * SLOT), -1, np.int32)
    rd = rowdata[1:].reshape(n_cap, G, TILE, SLOT)
    rd[:, :, :, :p_cap] = preds.transpose(1, 0, 2).reshape(
        n_cap, G, TILE, p_cap)
    rd[:, :, :, p_cap] = base.T.reshape(n_cap, G, TILE)
    # q_ext: [boundary 0, q, zeros]; width W + 128-aligned
    LQ = -(-(l_cap + 1 + W) // LANE) * LANE
    q_ext = np.zeros((Bp, LQ), np.int32)
    q_ext[:, 1:1 + l_cap] = qq
    fn = _poa_fwd_fn(match, mismatch, o1, e1, o2, e2, band, W, Bp, n_cap,
                     p_cap, LQ, interpret)
    outs = fn(jnp.asarray(meta), jnp.asarray(rowdata), jnp.asarray(q_ext))
    mats = [o[:, :B] for o in outs[:4]]
    offs = outs[4][:, :B, 0]
    endcol = outs[4][:, :B, 1]
    return tuple(mats) + (offs, endcol)


# ------------------------------------------------------- traceback sweep

# run-compressed traceback records (rec0 = qi_hi | type << 16,
# rec1 = qi_lo | (rank + 2) << 16):
#   type 0 DIAG  — one (qi_hi, rank) step
#   type 1 DEL   — one (-1, rank) step
#   type 2 INS   — steps (qi, -1) for qi = qi_hi down to qi_lo
REC_DIAG, REC_DEL, REC_INS = 0, 1, 2


def _poa_walk_kernel(meta_ref, hpack_ref, opack_ref, d1p_ref, d2p_ref,
                     offsb_ref, recs_ref, counts_ref, state_scr,
                     *, W, n_cap, maxrec):
    """Reverse row sweep: every traceback transition moves the walker to
    a strictly lower matrix row (diag -> node0, deletions -> the stored
    backpointer pred) or stays in the row only through a bounded chain
    (insertion run -> H0 -> deletion entry: <= 3 transitions), so ONE
    descending pass over rows retires the whole batch of walks with
    plain vector work per row — no lock-stepped while_loop, no per-step
    gathers. Insertion runs (and the row-0 boundary run) compress to one
    record each; the consumer expands records back to the exact step
    sequence of the XLA walk (bit-identical paths, tests assert it).
    State lanes: 0 st, 1 r, 2 j, 3 tgt, 4 k, 5 done."""
    ti = pl.program_id(0)
    jg = pl.program_id(1)
    t_row = n_cap - jg                       # sweep rows n_cap .. 0
    cidx = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 1)

    @pl.when(jg == 0)
    def _init():
        qlen = meta_ref[pl.ds(ti * TILE, TILE), :][:, 1:2]  # (TILE, 1)
        br = meta_ref[pl.ds(ti * TILE, TILE), :][:, 3:4]
        done0 = ((br <= 0) & (qlen <= 0)) | (br < 0)
        state_scr[:, :] = jnp.where(
            lidx == 1, br,
            jnp.where(lidx == 2, qlen,
                      jnp.where(lidx == 5, done0.astype(jnp.int32), 0)))

    hp = hpack_ref[0]                        # (TILE, W)
    op_ = opack_ref[0]
    d1 = d1p_ref[0]
    d2 = d2p_ref[0]
    off_col = offsb_ref[0][:, 0:1]           # (TILE, 1)

    def lane_at(mat, rel_col):
        """per-problem value at window-relative column rel (0 outside)."""
        return jnp.sum(jnp.where(cidx == rel_col, mat, 0), axis=1,
                       keepdims=True)

    # three unrolled transitions: an arriving walker leaves the row (or
    # finishes) within at most ins -> H0-del -> D
    for _it in range(3):
        st = state_scr[:, 0:1]
        r = state_scr[:, 1:2]
        jc = state_scr[:, 2:3]
        tg = state_scr[:, 3:4]
        done = state_scr[:, 5:6] != 0
        active = (~done) & (r == t_row)

        rel = jc - off_col
        hv = lane_at(hp, rel)
        ov = lane_at(op_, rel)
        dptr = jnp.where(st == 2, lane_at(d1, rel), lane_at(d2, rel))
        orig1v = ov & 0xFFFF
        orig2v = ov >> 16

        h_active = (st == 0) | (st == 1)
        d_active = (st == 2) | (st == 3)
        at_row0 = r == 0
        opv = jnp.where(st == 1, (hv >> 3) & 7, hv & 7)
        node0v = (hv >> 6) - 2
        h_is_diag = (~at_row0) & (opv == 0)
        h_is_ins = (~at_row0) & ((opv == 1) | (opv == 3))
        ins_t = jnp.where(opv == 1, orig1v, orig2v)
        d_pr = dptr >> 1
        d_ext = (dptr & 1) == 1

        # one record per transition (H deletion entry emits nothing)
        emit_diag = h_active & h_is_diag
        emit_del = d_active
        # insertion RUN: from j-1 down to the origin (row-0 boundary run
        # goes to column 0); j jumps straight to the run's end
        run_lo = jnp.where(at_row0, 0, ins_t)
        emit_ins = h_active & (at_row0 | h_is_ins) & (jc >= 1)
        do_emit = active & (emit_diag | emit_del | emit_ins)
        rtype = jnp.where(emit_del, REC_DEL,
                          jnp.where(emit_diag, REC_DIAG, REC_INS))
        rec0 = jnp.where(emit_ins, jc - 1,
                         jnp.where(emit_diag, jc - 1, 0)) \
            | (rtype << 16)
        rec1 = jnp.where(emit_ins, run_lo, 0) \
            | (jnp.where(emit_ins, -1, r - 1) + 2) << 16

        # next state (same transition table as the XLA walk, with the
        # INS state collapsed into the run record)
        st_h = jnp.where(
            at_row0, 0,
            jnp.where(h_is_diag, 0,
                      jnp.where(h_is_ins, 1,
                                jnp.where(opv == 2, 2, 3))))
        r_h = jnp.where(h_is_diag, node0v, r)
        j_h = jnp.where(at_row0, 0,
                        jnp.where(h_is_diag, jc - 1,
                                  jnp.where(h_is_ins, run_lo, jc)))
        tgt_h = jnp.where(h_is_ins, run_lo, tg)

        st_n = jnp.where(h_active, st_h, jnp.where(d_ext, st, 0))
        r_n = jnp.where(h_active, r_h, d_pr)
        j_n = jnp.where(h_active, j_h, jc)
        tgt_n = jnp.where(h_active, tgt_h, tg)
        fin_n = ((r_n <= 0) & (j_n <= 0)) | (r_n < 0)

        st_w = jnp.where(active, st_n, st)
        r_w = jnp.where(active, r_n, r)
        j_w = jnp.where(active, j_n, jc)
        tgt_w = jnp.where(active, tgt_n, tg)
        done_w = done | (active & fin_n)
        kcol = state_scr[:, 4:5]
        emit_i = do_emit.astype(jnp.int32)   # 32-bit: scalar-readable
        k_w = kcol + emit_i

        for t in range(TILE):
            kk = kcol[t, 0]
            idx = jnp.where(emit_i[t, 0] == 1, kk,
                            jnp.int32(maxrec - 1))
            recs_ref[pl.ds(idx, 1), 16 * t] = rec0[t:t + 1, 0]
            recs_ref[pl.ds(idx, 1), 16 * t + 1] = rec1[t:t + 1, 0]

        state_scr[:, :] = jnp.where(
            lidx == 0, st_w,
            jnp.where(lidx == 1, r_w,
                      jnp.where(lidx == 2, j_w,
                                jnp.where(lidx == 3, tgt_w,
                                          jnp.where(lidx == 4, k_w,
                                                    jnp.where(
                                                        lidx == 5,
                                                        done_w.astype(
                                                            jnp.int32),
                                                        0))))))

    @pl.when(jg == n_cap)
    def _fin():
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (TILE, LANE), 1)
        counts_ref[:, :] = jnp.where(lane128 == 0, state_scr[:, 4:5], 0)


@functools.lru_cache(maxsize=32)
def _poa_walk_fn(W, n_cap, B, interpret):
    maxrec = 2 * n_cap + 8
    kernel = functools.partial(_poa_walk_kernel, W=W, n_cap=n_cap,
                               maxrec=maxrec)
    fn = pl.pallas_call(
        kernel,
        grid=(B // TILE, n_cap + 1),
        in_specs=[
            pl.BlockSpec((B, LANE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),              # meta
        ] + [
            pl.BlockSpec((1, TILE, W), lambda i, j, n=n_cap: (n - j, i, 0),
                         memory_space=pltpu.VMEM)               # mats
            for _ in range(4)
        ] + [
            pl.BlockSpec((1, TILE, LANE),
                         lambda i, j, n=n_cap: (n - j, i, 0),
                         memory_space=pltpu.VMEM),              # offs
        ],
        out_specs=[
            # records live as (maxrec, B*16) — 16 lanes per problem
            # (rec0/rec1 in the first two), so a TILE block spans exactly
            # 128 lanes; a trailing dim of literal 2 would tile to 128
            # lanes per problem in VMEM and blow the scoped budget
            pl.BlockSpec((maxrec, TILE * 16), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),              # records
            pl.BlockSpec((TILE, LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),              # counts
        ],
        out_shape=[
            jax.ShapeDtypeStruct((maxrec, B * 16), jnp.int32),
            jax.ShapeDtypeStruct((B, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((TILE, 8), jnp.int32)],
        interpret=interpret,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=32)
def _walk_prologue_fn(n_cap, B):
    """Jitted on-device prologue: end-rank selection + the meta/offs
    blocks the walk kernel consumes — no host fetch between the forward
    and the walk."""
    def prologue(endcol, offs, nn, ends_pad, ql):
        rows = jnp.arange(n_cap + 1)[None, :]
        mask = ends_pad & (rows <= nn[:, None])
        col = jnp.transpose(endcol)          # (B, n_cap+1)
        br = jnp.argmax(jnp.where(mask, col, NEG - 1),
                        axis=1).astype(jnp.int32)
        lane = jnp.arange(LANE)[None, :]
        meta = jnp.where(lane == 1, ql[:, None],
                         jnp.where(lane == 3, br[:, None], 0)
                         ).astype(jnp.int32)
        offsb = jnp.where(jnp.arange(LANE)[None, None, :] == 0,
                          offs[:, :, None], 0).astype(jnp.int32)
        return meta, offsb

    return jax.jit(prologue)


def poa_walk_pallas(mats, nn, ends_r, ql, n_hi, interpret: bool = False):
    """Reverse-sweep traceback over poa_forward_pallas's outputs.
    Returns (records (maxrec, B*16) int32 — problem b's records are
    columns (16b, 16b+1), END->START emission order — and counts (B,));
    expand_walk_records turns a problem's (k, 2) record slice into the
    XLA walk's exact (qi, rank) step sequence. Everything between the
    forward and the walk stays on device (no fetch round trips)."""
    hpack, opack, d1p, d2p, offs, endcol = mats
    n_cap1, B, W = hpack.shape
    n_cap = n_cap1 - 1
    ends_pad = np.zeros((B, n_cap + 1), bool)
    ends_pad[:, 1:1 + ends_r.shape[1]] = ends_r
    meta, offsb = _walk_prologue_fn(n_cap, B)(
        endcol, offs, jnp.asarray(np.asarray(nn, np.int32)),
        jnp.asarray(ends_pad), jnp.asarray(np.asarray(ql, np.int32)))
    fn = _poa_walk_fn(W, n_cap, B, interpret)
    recs, counts = fn(meta, hpack, opack, d1p, d2p, offsb)
    return recs, counts[:, 0]


def expand_walk_records(recs: np.ndarray, k: int) -> np.ndarray:
    """One problem's records (emission order END->START) -> the XLA
    walk's buf contract: (steps, 2) int32 (qi, rank) REVERSE-order
    steps, exactly as _traceback_from_mats emits them."""
    steps = []
    for i in range(k):
        rec0 = int(recs[i, 0])
        rec1 = int(recs[i, 1])
        rtype = (rec0 >> 16) & 0x3
        qi_hi = rec0 & 0xFFFF
        qi_lo = rec1 & 0xFFFF
        rank = (rec1 >> 16) - 2
        if rtype == REC_DIAG:
            steps.append((qi_hi, rank))
        elif rtype == REC_DEL:
            steps.append((-1, rank))
        else:  # INS run: qi_hi down to qi_lo
            for qi in range(qi_hi, qi_lo - 1, -1):
                steps.append((qi, -1))
    return np.array(steps, np.int32).reshape(-1, 2)
