"""Pallas TPU kernel for the semi-Markov Viterbi scan.

One `pallas_call` runs the whole DP for a sequence chunk: the grid iterates
sequentially over blocks of BLK positions; an inner `fori_loop` performs the
per-base recursion with every window the XLA scan engine re-reads from HBM
each step (lane history, G pools, cumsums, lessD masks) held resident in
VMEM.  This removes the ~1 MB/step HBM traffic and per-op dispatch overhead
that bound engine/scan.py.

Data layout (see engine/pallas_pack.py):
  PM  (W+BLK, 64) f32/i32  position-major lane history: row j-blk0+W holds
                           lane values at j; written once per step, read for
                           point lookups (fixed jumps, backpointer preds)
  LM  (64, W+BLK) f32      lane-major mirror for window reads; refreshed
                           from PM by a (128,64)->(64,128) transpose every
                           128 steps (lane-dim stores must be 128-aligned)
  PH  (W+n_pad, 8)         full-history values/args of the pinned-state
                           lanes (reverse-strand ORF begins reach arbitrarily
                           far back, reference src/exonmodel.cc:1044)
  GS  (NGR, W+BLK) f32     per-block DMA of the G pool + intron cum1 rows
                           for the block's GC class
  MS  (NMS, W+BLK) i32     lessD b_valid / b_stopflag windows

Unaligned sliding windows are read as 128-aligned slices + `pltpu.roll`;
the <=127 positions newer than the last LM flush are merged in from PM via
a (128,1)->(1,128) transpose (tail merge).

Semantics mirror engine/scan.py step-for-step (same op order, same
first/last-argmax tie conventions), so Viterbi values and live backpointers
match the scan engine exactly; the gold engine (engine/gold.py) remains the
byte-exactness oracle.  States gated off at a position (scan computes their
dead backpointers anyway) get packed bp 0 here - traceback never reads them.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .device import DPTracks, F32_NEG
from .pallas_pack import (BLK, CH, EP, W_PAD, PKStatic, PallasFallback,
                          pack_tracks)

NEGF = float(F32_NEG)
GATE = -1.0e29
W = W_PAD
SLACK = 512           # aligned-superwindow reads may overrun by < 384 cols


def _ru(x: int, m: int = 128) -> int:
    return ((x + m - 1) // m) * m


def _iota_lane(width: int, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (1, width), 1)


def _winread(ref, row, cs, WP):
    """(1, WP) window of `ref` row starting at dynamic col cs (row dynamic).

    Reads the 128-aligned superwindow and rolls it into place (dynamic
    lane-dim slices must be 128-aligned on TPU).
    """
    a0 = pl.multiple_of((cs // 128) * 128, 128)
    r = cs - a0
    raw = ref[pl.ds(row, 1), pl.ds(a0, WP + 128)]
    size = WP + 128
    return pltpu.roll(raw, shift=(size - r) % size, axis=1)[:, :WP]


def _lm_window(LM, PM, lane, cs, WP, f_col):
    """LM row window with the unflushed tail merged in from PM.

    cs: LM col of window start; f_col: first LM col not yet flushed.
    Window positions beyond the current step are never consumed (masked by
    the callers' begin/eop bounds), so the 128-periodic tail tiling never
    wraps into live data.
    """
    rolled = _winread(LM, lane, cs, WP)
    tail_col = PM[pl.ds(f_col, 128), pl.ds(lane, 1)]        # (128, 1)
    tail = jnp.transpose(tail_col, (1, 0))                   # (1, 128)
    sh = (f_col - cs) % 128
    tail_r = pltpu.roll(tail, shift=sh, axis=1)
    tiled = jnp.concatenate([tail_r] * (WP // 128), axis=1)
    widx = _iota_lane(WP)
    return jnp.where(widx >= (f_col - cs), tiled, rolled)


def _first_argmax_rows(x):
    """(max, argmax) over axis 0 (first-match), keepdims, for (R, L) x."""
    m = jnp.max(x, axis=0, keepdims=True)
    iot = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    a = jnp.min(jnp.where(x == m, iot, np.int32(1 << 30)), axis=0,
                keepdims=True)
    return m, a


def _last_argmax_lane(score, width):
    """(max, last-argmax) of a (1, width) vector (scan's conv/lessD rule)."""
    m = jnp.max(score)
    idx = jnp.max(jnp.where(score == m, _iota_lane(width), -1))
    return m, jnp.maximum(idx, 0)


INT_FILL = np.int32(-(1 << 30))


def _extract(vec, lane, width, fill):
    """Scalar vec[0, lane] with a traced lane index."""
    return jnp.max(jnp.where(_iota_lane(width) == lane, vec,
                             jnp.full_like(vec, fill)))


def _col_scalar(ref, row, col, fill):
    """ref[row, col] with traced col (lane-dim loads must be aligned)."""
    a0 = pl.multiple_of((col // 128) * 128, 128)
    win = ref[pl.ds(row, 1), pl.ds(a0, 128)]
    return _extract(win, col - a0, 128, fill)


def make_kernel(st: PKStatic):
    """Build the kernel function for a fixed PKStatic."""
    n, NGR, NMS = st.n, st.NGR, st.NMS
    PHW = st.PHW          # pinned-history ring (absolute col % PHW)
    NB = st.n_blocks

    def hint_quot(hs, HW, XHrow, XIrow, csG, WPv, j, a_off, len_hi):
        """Exonpart/CDSpart/exon/CDS hint quotient over one conv band —
        port of scan._hint_quot (reference exonmodel.cc:1769-1860) onto
        the VMEM-resident HW windows + XH/XI per-position planes."""
        lm_ep, lm_cp, lm_ex, lm_cds, lm_loc = st.hint_lm
        o1 = csG - hs.ipo - 1
        o2 = csG - hs.ipo
        widx = _iota_lane(WPv)
        bvec = (j + a_off - len_hi) + widx
        bob = bvec - hs.ipo

        def WR(row, cs):
            return _winread(HW, row, cs, WPv)

        def xf(l):
            return _extract(XHrow, l, 128, F32_NEG)

        def xint(l):
            return _extract(XIrow, l, 128, INT_FILL)

        zero = jnp.zeros((1, WPv), jnp.float32)
        cov_ep = zero + xf(hs.x_tx_ep)
        cov_cp = zero + xf(hs.x_tx_cp)
        covc_ep = zero + xf(hs.x_txc_ep)
        covc_cp = zero + xf(hs.x_txc_cp)
        for (sl, wl, fl) in hs.cross:
            sk, wk, flv = xint(sl), xf(wl), xint(fl)
            sub = (sk >= bob).astype(jnp.float32)
            cov_ep = cov_ep - jnp.where(flv == 1, wk, 0.0) * sub
            covc_ep = covc_ep - jnp.where(flv == 1, 1.0, 0.0) * sub
            cov_cp = cov_cp - jnp.where(flv == 2, wk, 0.0) * sub
            covc_cp = covc_cp - jnp.where(flv == 2, 1.0, 0.0) * sub
        crw_ep = WR(hs.w_cr_ep, o2)
        inside_ep = xf(hs.x_be_ep) - WR(hs.w_be_ep, o1) - crw_ep + cov_ep
        inside_cp = xf(hs.x_be_cp) - WR(hs.w_be_cp, o1) - \
            WR(hs.w_cr_cp, o2) + cov_cp
        ccw_ep = WR(hs.w_cntcr_ep, o2)
        cin_ep = xf(hs.x_cntbe_ep) - WR(hs.w_cntbe_ep, o1) - ccw_ep + covc_ep
        cin_cp = xf(hs.x_cntbe_cp) - WR(hs.w_cntbe_cp, o1) - \
            WR(hs.w_cntcr_cp, o2) + covc_cp
        part_bonus = inside_ep + inside_cp
        nep = cin_ep + cin_cp
        if hs.aL:
            part_bonus = part_bonus + 0.5 * (crw_ep - cov_ep)
            nep = nep + (ccw_ep - covc_ep)
        if hs.aR:
            part_bonus = part_bonus + 0.5 * (xf(hs.x_c2_ep) - cov_ep)
            nep = nep + (xf(hs.x_cntc2_ep) - covc_ep)
        quot = part_bonus
        sup_ex = zero
        sup_cds = zero
        for (pl_, wl, kl) in hs.ex:
            pk, wk, kd = xint(pl_), xf(wl), xint(kl)
            cond = ((kd == 1) & (bob == pk)).astype(jnp.float32)
            quot = quot + wk * cond
            sup_cds = jnp.maximum(sup_cds, cond)
            if hs.exclass == 1:
                cond = ((kd == 2) & (bob == pk)).astype(jnp.float32)
                quot = quot + wk * cond
                sup_ex = jnp.maximum(sup_ex, cond)
            elif hs.exclass == 3:
                cond = ((kd == 3) & (pk < bob) &
                        (pk > -(1 << 29))).astype(jnp.float32)
                quot = quot + 0.5 * wk * cond
                sup_ex = jnp.maximum(sup_ex, cond)
        if hs.exclass == 2:
            for (sl, wl, fl) in hs.cross:
                sk, wk, flv = xint(sl), xf(wl), xint(fl)
                cond = ((flv == 4) & (bob == sk)).astype(jnp.float32)
                quot = quot + 0.5 * wk * cond
                sup_ex = jnp.maximum(sup_ex, cond)
        quot = quot + lm_ex * (1.0 - sup_ex) + lm_cds * (1.0 - sup_cds)
        lenv = jnp.float32(len_hi) - widx.astype(jnp.float32)
        d_ep = lenv - (xf(hs.x_cnte_ep) - WR(hs.w_cnte_ep, o1))
        d_cp = lenv - (xf(hs.x_cnte_cp) - WR(hs.w_cnte_cp, o1))
        quot = quot + jnp.where(d_ep > 0, d_ep * lm_ep, 0.0)
        quot = quot + jnp.where(d_cp > 0, d_cp * lm_cp, 0.0)
        zc = xf(hs.x_zc) - WR(hs.w_zc, o1)
        lpm = jnp.where(zc > 0, zc * lm_loc, 0.0)
        lpm = jnp.maximum(lpm, -part_bonus)
        quot = quot + jnp.where(nep >= 4.5, lpm, 0.0)
        return quot

    def kernel(cls_ref, sps_hbm, spg_hbm, sph_hbm, ipc_hbm, ipm_hbm,
               xh_hbm, xi_hbm, hw_hbm,
               gcum_hbm, msk_hbm, ltc_ref, ltT_ref, sel_ref, lv_ref,
               v0_ref, l0_ref, a0_ref, cmask_ref,
               bp_out, v_out, vd_out,
               GS, MS, HW, SPS, SPG, SPH, IPC, IPM, XH, XI, BPS, VDBG,
               PM, PMA, LM, PHL, PHLA, VC, LTC, sems):
        i = pl.program_id(0)
        blk0 = i * BLK
        # [c0, sw1, c1, sw2, c2]: class runs of this block; the GS scratch
        # is re-DMA'd at each switch (GC class may change mid-block)
        cb = cls_ref[i, 0]
        sw1, cb1 = cls_ref[i, 1], cls_ref[i, 2]
        sw2, cb2 = cls_ref[i, 3], cls_ref[i, 4]

        # ---- block-start DMA (j-planes + b-window arrays) ----------------
        cps = [
            pltpu.make_async_copy(gcum_hbm.at[cb, :, pl.ds(blk0, W + BLK + SLACK)],
                                  GS, sems.at[0]),
            pltpu.make_async_copy(msk_hbm.at[:, pl.ds(blk0, W + BLK + SLACK)],
                                  MS, sems.at[1]),
            pltpu.make_async_copy(sps_hbm.at[pl.ds(blk0, BLK), :], SPS,
                                  sems.at[2]),
            pltpu.make_async_copy(spg_hbm.at[pl.ds(blk0, BLK), :], SPG,
                                  sems.at[3]),
            pltpu.make_async_copy(sph_hbm.at[pl.ds(blk0, BLK), :], SPH,
                                  sems.at[4]),
            pltpu.make_async_copy(ipc_hbm.at[pl.ds(blk0, BLK), :], IPC,
                                  sems.at[5]),
            pltpu.make_async_copy(ipm_hbm.at[pl.ds(blk0, BLK), :], IPM,
                                  sems.at[6]),
        ]
        if st.NHW:
            cps += [
                pltpu.make_async_copy(xh_hbm.at[pl.ds(blk0, BLK), :], XH,
                                      sems.at[9]),
                pltpu.make_async_copy(xi_hbm.at[pl.ds(blk0, BLK), :], XI,
                                      sems.at[10]),
                pltpu.make_async_copy(
                    hw_hbm.at[:, pl.ds(blk0, W + BLK + SLACK)], HW,
                    sems.at[11]),
            ]
        for c in cps:
            c.start()

        # ---- carry init / shift ------------------------------------------
        @pl.when(i == 0)
        def _():
            l0 = l0_ref[:, :]
            a0 = a0_ref[:, :]
            PM[0:W, :] = jnp.broadcast_to(l0, (W, 64))
            PMA[0:W, :] = jnp.broadcast_to(a0, (W, 64))
            LM[:, 0:W] = jnp.broadcast_to(jnp.transpose(l0, (1, 0)), (64, W))
            PHL[:, :] = jnp.broadcast_to(
                jnp.transpose(l0[:, 0:8], (1, 0)), (8, PHW))
            PHLA[:, :] = jnp.broadcast_to(
                jnp.transpose(a0[:, 0:8], (1, 0)), (8, PHW))
            VC[:, :] = v0_ref[:, :]

        @pl.when(i > 0)
        def _():
            # shift the last W positions to the front (chunked, increasing
            # dst: src row = dst + BLK > dst, so no clobbering)
            for c0 in range(0, W, 640):
                PM[c0:c0 + 640, :] = PM[c0 + BLK: c0 + BLK + 640, :]
                PMA[c0:c0 + 640, :] = PMA[c0 + BLK: c0 + BLK + 640, :]
                LM[:, c0:c0 + 640] = LM[:, c0 + BLK: c0 + BLK + 640]

        for c in cps:
            c.wait()

        LTC[:, :] = ltc_ref[cb]       # transitions of the block-start class

        def step(jj, _):
            j = blk0 + jj

            # ---- mid-block GC class switch: refresh G/cum + transitions --
            for swv, cbv in ((sw1, cb1), (sw2, cb2)):
                @pl.when(jj == swv)
                def _(cbv=cbv):
                    cp = pltpu.make_async_copy(
                        gcum_hbm.at[cbv, :, pl.ds(blk0, W + BLK + SLACK)],
                        GS, sems.at[0])
                    cp.start()
                    LTC[:, :] = ltc_ref[cbv]
                    cp.wait()

            @pl.when((j >= 1) & (j < n))
            def _():
                vprev = VC[:, :]                              # (1, 64)
                sps = SPS[pl.ds(jj, 1), 0:64]                 # (1, 64)
                spg = SPG[pl.ds(jj, 1), 0:64]
                sph = SPH[pl.ds(jj, 1), :]                    # (1, 256)
                ipm = IPM[pl.ds(jj, 1), :]                    # (1, 128) i32
                ipc = IPC[pl.ds(jj, 1), :]
                f_col = W + (jj // 128) * 128                 # LM flush edge

                # ---- chain (+ global predecessor argmax) ----------------
                ltc = LTC[:, :]       # class at j (kept fresh by the
                #                       block-start/switch writes above)
                vcol = jnp.transpose(vprev, (1, 0))           # (64, 1)
                cand, carg = _first_argmax_rows(vcol + ltc)   # (1,64) each
                chm = cmask_ref[0:1, :] != 0
                v = jnp.where(
                    chm, jnp.where(cand > GATE, cand + sps, NEGF), NEGF)
                pred = jnp.where(chm, carg, 0)
                offv = jnp.where(chm, 1, 0)

                # ---- fixed groups ---------------------------------------
                gbits = _extract(ipm, st.gate_lane, 128, INT_FILL)
                for gi, g in enumerate(st.fixed_groups):
                    gmask = cmask_ref[gi + 1: gi + 2, :] != 0

                    def fgrp(g=g, gmask=gmask, v=v, pred=pred, offv=offv,
                             sps=sps, spg=spg):
                        row = PM[pl.ds(jj + W - g.jump, 1), :]
                        arow = PMA[pl.ds(jj + W - g.jump, 1), :]
                        rcol = jnp.transpose(row, (1, 0))
                        acol = jnp.transpose(arow.astype(jnp.float32),
                                             (1, 0))
                        selA = sel_ref[g.sel_idx]
                        lvA = jnp.max(rcol + selA, axis=0, keepdims=True)
                        laA = jnp.max(acol + selA, axis=0, keepdims=True)
                        if g.kind == 0:
                            lv, la = lvA, laA
                        elif g.kind == 1:
                            lv, la = lvA + spg, laA
                        else:
                            selB = sel_ref[g.selb_idx]
                            lvB = jnp.max(rcol + selB, axis=0,
                                          keepdims=True) + spg
                            laB = jnp.max(acol + selB, axis=0,
                                          keepdims=True)
                            lv = jnp.maximum(lvA, lvB)
                            la = jnp.where(lvB > lvA, laB, laA)
                        ok = (lv > GATE) & (sps > GATE)
                        nv = jnp.where(gmask,
                                       jnp.where(ok, lv + sps, NEGF), v)
                        npred = jnp.where(gmask & ok, la.astype(jnp.int32),
                                          pred)
                        noff = jnp.where(gmask & ok, g.jump, offv)
                        return nv, npred, noff

                    v, pred, offv = jax.lax.cond(
                        ((gbits >> g.gate_bit) & 1) != 0, fgrp,
                        lambda v=v, pred=pred, offv=offv: (v, pred, offv))

                # ---- lessD ----------------------------------------------
                # states sharing a bare splice lane share the same end
                # gate (the psi columns are NEG at identical positions):
                # one cond per LANE GROUP instead of one per state — same
                # body work when live, 3x fewer scalar-unit conds
                sc_vals: List = []     # (state, val, pred, off) scalars
                lessd_groups: Dict[int, list] = {}
                for lsd in st.lessd:
                    lessd_groups.setdefault(lsd.lane, []).append(lsd)
                for grp_ls in lessd_groups.values():
                    psis = [_extract(sps, lsd.state, 64, F32_NEG)
                            for lsd in grp_ls]
                    any_psi = psis[0]
                    for pv_ in psis[1:]:
                        any_psi = jnp.maximum(any_psi, pv_)

                    def flsd_grp(grp_ls=grp_ls, psis=psis, jj=jj, j=j,
                                 ipm=ipm, f_col=f_col):
                        outs = []
                        # the window/lane reads are per-state (cum rows
                        # and stop masks differ), but the L window is
                        # shared per lane — hoist it
                        W5 = grp_ls[0].window
                        WP5 = _ru(W5)
                        cs = jj + W - W5
                        Lsh = _lm_window(LM, PM, grp_ls[0].lane, cs, WP5,
                                         f_col)
                        widx = _iota_lane(WP5)
                        inw = widx < W5
                        eops_ok = ((j - W5) + widx) >= 0
                        prow_cache = {}
                        for lsd, psi in zip(grp_ls, psis):
                            assert lsd.window == W5 and \
                                lsd.lane == grp_ls[0].lane
                            cumw = _winread(GS, lsd.cum_row, cs, WP5)
                            cumj = _col_scalar(GS, lsd.cum_row,
                                               jj + W, F32_NEG)
                            bv = _winread(MS, lsd.valid_row, cs, WP5)
                            bs = _winread(MS, lsd.stop_row, cs, WP5)
                            jsel = _extract(ipm, lsd.jsel_lane, 128,
                                            INT_FILL)
                            lvd = lv_ref[0:1,
                                         lsd.lv_off: lsd.lv_off + W5]
                            stop = (bs & jsel) != 0
                            ok = inw & eops_ok & (bv != 0) & (~stop)
                            lvd_p = jnp.concatenate(
                                [lvd, jnp.full((1, WP5 - W5), F32_NEG,
                                               jnp.float32)], axis=1)
                            seg = cumj - cumw
                            score = jnp.where(ok & (Lsh > GATE),
                                              ((Lsh + seg) + lvd_p) + psi,
                                              NEGF)
                            best, ridx = _last_argmax_lane(score, WP5)
                            prow = PMA[pl.ds(jj + W - W5 + ridx, 1), :]
                            p = _extract(prow, lsd.lane, 64, INT_FILL)
                            val = jnp.where(best > GATE, best,
                                            jnp.float32(NEGF))
                            outs.append(val)
                            outs.append(p)
                            outs.append((W5 - ridx).astype(jnp.int32))
                        return tuple(outs)

                    def flsd_none(grp_ls=grp_ls):
                        outs = []
                        for _ in grp_ls:
                            outs.extend([jnp.float32(NEGF), jnp.int32(0),
                                         jnp.int32(1)])
                        return tuple(outs)

                    flat = jax.lax.cond(any_psi > GATE, flsd_grp, flsd_none)
                    for i, lsd in enumerate(grp_ls):
                        sc_vals.append((lsd.state, flat[3 * i],
                                        flat[3 * i + 1], flat[3 * i + 2]))

                # ---- pinned ---------------------------------------------
                # one cond over ALL pinned states (each is live at only a
                # few % of positions; four separate lax.conds cost more
                # scalar-unit overhead per step than one combined body)
                if st.pinned:
                    scs = [_extract(sps, pn.state, 64, F32_NEG)
                           for pn in st.pinned]
                    any_sc = scs[0]
                    for scv in scs[1:]:
                        any_sc = jnp.maximum(any_sc, scv)

                    def fpin_all(scs=scs, ipm=ipm, j=j, jj=jj):
                        outs = []
                        for pn, sc in zip(st.pinned, scs):
                            eop = _extract(ipm, pn.eop_lane, 128, INT_FILL)
                            eop = jnp.maximum(eop, -W)
                            blk0 = j - jj

                            def recent(eop=eop, pn=pn):
                                row = PM[pl.ds(eop - blk0 + W, 1), :]
                                arow = PMA[pl.ds(eop - blk0 + W, 1), :]
                                return (_extract(row, pn.lane, 64, F32_NEG),
                                        _extract(arow, pn.lane, 64,
                                                 INT_FILL))

                            def old(eop=eop, pn=pn):
                                rc = jnp.remainder(eop + W, PHW)
                                return (_col_scalar(PHL, pn.lane, rc,
                                                    F32_NEG),
                                        _col_scalar(PHLA, pn.lane, rc,
                                                    INT_FILL))

                            lv, la = jax.lax.cond(eop >= blk0 - W, recent,
                                                  old)
                            val = jnp.where((lv > GATE) & (sc > GATE),
                                            lv + sc, jnp.float32(NEGF))
                            outs.append(val)
                            outs.append(la)
                            outs.append((j - eop).astype(jnp.int32))
                        return tuple(outs)

                    def fpin_none():
                        outs = []
                        for _ in st.pinned:
                            outs.extend([jnp.float32(NEGF), jnp.int32(0),
                                         jnp.int32(1)])
                        return tuple(outs)

                    flat = jax.lax.cond(any_sc > GATE, fpin_all, fpin_none)
                    for i, pn in enumerate(st.pinned):
                        sc_vals.append((pn.state, flat[3 * i],
                                        flat[3 * i + 1], flat[3 * i + 2]))

                # ---- exon convolutions ----------------------------------
                for cv in st.convs:
                    gp = _extract(ipc, cv.ip_lane, 128, INT_FILL)

                    def fconv(cv=cv, gp=gp, ipc=ipc, sph=sph, jj=jj, j=j,
                              f_col=f_col):
                        phi = gp >> 1
                        smin = _extract(ipc, cv.ip_lane + 1, 128, INT_FILL)
                        smax = _extract(ipc, cv.ip_lane + 2, 128, INT_FILL)
                        best = jnp.float32(NEGF)
                        bpred = jnp.int32(0)
                        boff = jnp.int32(1)
                        for var in cv.variants:
                            wd = var.width
                            WPv = _ru(wd)
                            csG = jj + W + cv.a_off - var.len_hi
                            G = _winread(GS, var.g3row + phi, csG, WPv)
                            csL = csG - cv.bpl - 1
                            if cv.frame_mode:
                                L = jnp.zeros((1, WPv), jnp.float32)
                                for f in range(3):
                                    mf = lv_ref[0:1, var.fm_off + f * wd:
                                                var.fm_off + (f + 1) * wd]
                                    mfp = jnp.concatenate(
                                        [mf, jnp.zeros((1, WPv - wd),
                                                       jnp.float32)], axis=1)
                                    Lf = _lm_window(LM, PM, cv.lane + f,
                                                    csL, WPv, f_col)
                                    L = L + Lf * mfp
                            else:
                                L = _lm_window(LM, PM, cv.lane, csL, WPv,
                                               f_col)
                            lvd = lv_ref[0:1, var.lv_off: var.lv_off + wd]
                            lvd_p = jnp.concatenate(
                                [lvd, jnp.full((1, WPv - wd), F32_NEG,
                                               jnp.float32)], axis=1)
                            widx = _iota_lane(WPv)
                            bvec = (j + cv.a_off - var.len_hi) + widx
                            okb = ((bvec >= smin) & (bvec <= smax) &
                                   (widx < wd))
                            if var.g2row >= 0:
                                G2 = _winread(GS, var.g2row + phi, csG, WPv)
                                G = jnp.where(widx >= var.g2_from, G2, G)
                            base_sc = (L + G) + lvd_p
                            if cv.hint is not None:
                                XHrow = XH[pl.ds(jj, 1), :]
                                XIrow = XI[pl.ds(jj, 1), :]
                                base_sc = base_sc + hint_quot(
                                    cv.hint, HW, XHrow, XIrow, csG, WPv,
                                    j, cv.a_off, var.len_hi)
                            if var.hv_base >= 0:
                                # merged short band: per-length H vector
                                # (H folded before the max; fl monotone ->
                                # identical max VALUE to the per-variant
                                # "max then +H" order, ties resolved to
                                # the smallest length as before)
                                Hv = sph[0:1,
                                         var.hv_base: var.hv_base + wd]
                                Hvp = jnp.concatenate(
                                    [Hv, jnp.full((1, WPv - wd), F32_NEG,
                                                  jnp.float32)], axis=1)
                                score = jnp.where(
                                    okb & (L > GATE) & (G > GATE) &
                                    (Hvp > GATE), base_sc + Hvp, NEGF)
                                sbest, ridx = _last_argmax_lane(score, WPv)
                                vbest = jnp.where(sbest > GATE, sbest,
                                                  jnp.float32(NEGF))
                            else:
                                score = jnp.where(
                                    okb & (L > GATE) & (G > GATE),
                                    base_sc, NEGF)
                                sbest, ridx = _last_argmax_lane(score, WPv)
                                H = _extract(sph, var.h_lane, 256, F32_NEG)
                                vbest = jnp.where((sbest > GATE) &
                                                  (H > GATE),
                                                  sbest + H, NEGF)
                            take = vbest > best
                            prow = PMA[pl.ds(csL + ridx, 1), :]
                            if cv.frame_mode:
                                # fsel[ridx]: periodic frame pattern
                                # recovered from the packed masks
                                m0 = lv_ref[0, var.fm_off]
                                m1 = lv_ref[0, var.fm_off + wd]
                                f0 = jnp.where(m0 > 0.5, 0,
                                               jnp.where(m1 > 0.5, 1, 2))
                                sgn = 1 if cv.frame_mode == 1 else -1
                                f = (f0 + sgn * ridx) % 3
                            else:
                                f = jnp.int32(0)
                            p = _extract(prow, cv.lane + f, 64, INT_FILL)
                            woff = (var.len_hi - cv.a_off + cv.bpl + 1) \
                                - ridx
                            best = jnp.where(take, vbest, best)
                            bpred = jnp.where(take, p, bpred)
                            boff = jnp.where(take, woff, boff)
                        return best, bpred, boff

                    val, p, off = jax.lax.cond(
                        (gp & 1) != 0, fconv,
                        lambda: (jnp.float32(NEGF), jnp.int32(0), jnp.int32(1)))
                    sc_vals.append((cv.state, val, p, off))

                # ---- scatter scalar-producing states --------------------
                lane_iota = _iota_lane(64)
                for s, val, p, off in sc_vals:
                    onehot = lane_iota == s
                    v = jnp.where(onehot, val, v)
                    pred = jnp.where(onehot, p, pred)
                    offv = jnp.where(onehot, off, offv)

                VC[:, :] = v
                BPS[pl.ds(jj, 1), 0:64] = (pred << 20) | offv
                VDBG[pl.ds(jj, 1), 0:64] = v

            @pl.when(j == 0)
            def _():
                BPS[pl.ds(jj, 1), 0:64] = jnp.zeros((1, 64), jnp.int32)

            # ---- lane update + history writes (every j < n) -------------
            @pl.when(j < n)
            def _():
                vnow = VC[:, :]
                vcol2 = jnp.transpose(vnow, (1, 0))
                lmat = vcol2 + ltT_ref[:, :]                  # (64, 64)
                lval, larg = _first_argmax_rows(lmat)
                PM[pl.ds(jj + W, 1), :] = lval
                PMA[pl.ds(jj + W, 1), :] = larg

            # ---- LM flush every 128 steps --------------------------------
            @pl.when(jj % 128 == 127)
            def _():
                col = pl.multiple_of(jj + W - 127, 128)
                gcol = pl.multiple_of(
                    jnp.remainder(blk0 + jj + W - 127, PHW), 128)
                blkv = jnp.transpose(PM[pl.ds(col, 128), :], (1, 0))
                blka = jnp.transpose(PMA[pl.ds(col, 128), :], (1, 0))
                LM[:, pl.ds(col, 128)] = blkv
                PHL[:, pl.ds(gcol, 128)] = blkv[0:8, :]
                PHLA[:, pl.ds(gcol, 128)] = blka[0:8, :]

            return 0

        jax.lax.fori_loop(0, BLK, step, 0)
        v_out[:, :] = VC[:, :]

        # ---- stream the block's backpointers out -------------------------
        out_dma = pltpu.make_async_copy(BPS, bp_out.at[pl.ds(blk0, BLK), :],
                                        sems.at[7])
        out_dma.start()
        vd_dma = pltpu.make_async_copy(VDBG,
                                       vd_out.at[pl.ds(blk0, BLK), :],
                                       sems.at[8])
        vd_dma.start()
        out_dma.wait()
        vd_dma.wait()

    return kernel


_PL_CACHE: Dict[tuple, object] = {}


def build_call(st: PKStatic, interpret: bool = False):
    """The raw pallas_call for one PKStatic (no jit wrapper): shared by
    make_pallas_fn and the fused device-prep engine (pallas_prep), which
    invokes it inside its own jit."""
    kernel = make_kernel(st)

    NHWs = max(st.NHW, 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(st.n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 10 + [
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ltc_all
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lt_T
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sel_pack
            pl.BlockSpec(memory_space=pltpu.VMEM),   # lv_pack
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # l0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # a0
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cmask
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        scratch_shapes=[
            pltpu.VMEM((st.NGR, W + BLK + SLACK), jnp.float32),  # GS
            pltpu.VMEM((st.NMS, W + BLK + SLACK), jnp.int32),    # MS
            pltpu.VMEM((NHWs, W + BLK + SLACK), jnp.float32),    # HW
            pltpu.VMEM((BLK, 128), jnp.float32),             # SPS
            pltpu.VMEM((BLK, 128), jnp.float32),             # SPG
            pltpu.VMEM((BLK, 256), jnp.float32),             # SPH
            pltpu.VMEM((BLK, 128), jnp.int32),               # IPC
            pltpu.VMEM((BLK, 128), jnp.int32),               # IPM
            pltpu.VMEM((BLK, 128), jnp.float32),             # XH
            pltpu.VMEM((BLK, 128), jnp.int32),               # XI
            pltpu.VMEM((BLK, 128), jnp.int32),               # BPS
            pltpu.VMEM((BLK, 128), jnp.float32),             # VDBG
            pltpu.VMEM((W + BLK, 64), jnp.float32),          # PM
            pltpu.VMEM((W + BLK, 64), jnp.int32),            # PMA
            pltpu.VMEM((64, W + BLK + SLACK), jnp.float32),      # LM
            pltpu.VMEM((8, st.PHW), jnp.float32),            # PHL
            pltpu.VMEM((8, st.PHW), jnp.int32),              # PHLA
            pltpu.VMEM((1, 64), jnp.float32),                # VC
            pltpu.VMEM((64, 64), jnp.float32),               # LTC
            pltpu.SemaphoreType.DMA((12,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((st.n_pad, 128), jnp.int32),
                   jax.ShapeDtypeStruct((1, 64), jnp.float32),
                   jax.ShapeDtypeStruct((st.n_pad, 128), jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def make_pallas_fn(st: PKStatic, interpret: bool = False):
    """Jitted whole-DP callable for one PKStatic config (cached).

    The kernel closure, pallas_call and jit wrapper are built once per
    static config: re-tracing/lowering/compiling per run used to cost more
    than the DP itself (trace+lower alone is ~12 s at 100 kb)."""
    fn = _PL_CACHE.get((st, interpret))
    if fn is not None:
        return fn
    call = build_call(st, interpret)

    def _run(a):
        from .pallas_pack import expand_arrays
        p = expand_arrays(st, a)         # compact inputs -> dense planes,
        #                                  fused with the kernel call on
        #                                  device (nothing leaves HBM)
        return call(
            a["cls_blk"], p["sp_state"], p["sp_geo"], p["sp_convH"],
            p["ip_conv"], p["ip_misc"], p["xh_plane"], p["xi_plane"],
            p["hw_hbm"], p["gcum_hbm"], p["msk_hbm"],
            a["ltc_all"], a["lt_T"], a["sel_pack"], a["lv_pack"],
            a["v0"], a["l0"], a["a0"], a["cmask"])

    fn = jax.jit(_run)
    _PL_CACHE[(st, interpret)] = fn
    return fn


class PallasEngine:
    """Drop-in fast path for ScanEngine backed by the Pallas DP kernel."""

    def __init__(self, tracks: DPTracks, interpret: bool = False):
        self.tracks = tracks
        self.static, self.arrays = pack_tracks(tracks)
        st = self.static
        nm = 1 + len(st.fixed_groups)
        cmask = np.zeros((nm, 64), dtype=np.int32)
        for s in st.chain_states:
            cmask[0, s] = 1
        for gi, g in enumerate(st.fixed_groups):
            for s in g.states:
                cmask[gi + 1, s] = 1
        self.arrays["cmask"] = cmask
        self.n, self.S = st.n, st.S
        self._jit = make_pallas_fn(st, interpret)

    def run(self) -> None:
        a = {k: jnp.asarray(v) for k, v in self.arrays.items()}
        bps, vfin, vdbg = self._jit(a)
        # keep the big planes on device: transfer lazily / walk on device
        self._bps_dev = bps
        self._vdbg_dev = vdbg
        vf = np.full(self.tracks.S, F32_NEG, dtype=np.float32)
        vf[: self.S] = np.asarray(vfin)[0, : self.S]
        self.v_final = vf

    @property
    def backptr(self) -> np.ndarray:
        return np.asarray(self._bps_dev)[: self.n]

    @property
    def v_debug(self) -> np.ndarray:
        return np.asarray(self._vdbg_dev)[: self.n]

    def _walk_start(self) -> int:
        last = self.v_final + np.asarray(self.tracks.log_term)
        state = int(np.argmax(last))
        if last[state] <= float(F32_NEG) / 2:
            raise RuntimeError("No feasible path found in HMM (pallas)")
        return state

    def _trace_packed(self):
        from .traceback import make_trace_fn
        state0 = self._walk_start()
        fn = make_trace_fn(self.n, 0)
        packed, final_base = fn(self._bps_dev, state0)
        return np.asarray(packed), int(final_base)

    def traceback(self):
        """Raw segment list (kernel bp row j == scan bps[j-1])."""
        from .traceback import raw_segments
        packed, fb = self._trace_packed()
        return raw_segments(packed, fb, self.tracks.gold.sg.state_types)

    def traceback_path(self, dnalen: int):
        """Condensed PathState list (fast path: device walk + vectorized
        merge; equals og.condense_path(self.traceback(), dnalen))."""
        from .traceback import condensed_path
        packed, fb = self._trace_packed()
        return condensed_path(packed, fb, dnalen,
                              self.tracks.gold.sg.state_types)
