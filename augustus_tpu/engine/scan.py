"""JAX scan DP engine (single-chip fast path).

Runs the semi-Markov Viterbi as one `jax.lax.scan` over sequence positions.
Per position the work is fully vectorized; all per-position scalar tracks
(emissions of chain/fixed states, H factors, gates, bounds, the GC class) are
consolidated on the host into a single (n, NS) float table and a (n, NI)
int table, so each step issues exactly two contiguous row reads plus the
banded window slices.  The GC-content class is baked into every per-position
scalar at build time (the reference switches parameter sets at class
boundaries — src/namgene.cc:244-247 — which is a pure function of position).

The engine is split into STATIC structure (hashable, baked into the compiled
function) and ARRAY inputs (a pytree), so the compiled function can be
vmapped / shard_mapped over a batch of sequence chunks.

Numerics are float32 log space.  The gold engine (engine/gold.py, float64)
is the parity oracle; this engine matches it except on float near-ties and
exons longer than the convolution cap (engine/device.py CONV_CAP).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..model.state_config import ST
from .device import DPTracks, F32_NEG, END_PAD
from . import xputil as U

NEG = jnp.float32(F32_NEG)
GATE = jnp.float32(-1.0e29)


@dataclass(frozen=True)
class VariantStatic:
    g_id: int                 # row in G_all
    h_col: int                # column in the scalar table
    len_lo: int
    len_hi: int
    width: int
    fsel: Optional[tuple]
    vb_lo: Optional[int] = None   # absolute begin-position bounds (UTR)
    vb_hi: Optional[int] = None


@dataclass(frozen=True)
class HintConvStatic:
    """Sparse exon-hint machinery for one conv state (device.HintTables).

    Window-row indices index hw_all; x-side values are scalar columns
    pre-shifted to x = j + base_offset; cross/ex entry fields are
    (int_col, scal_col, int_col) triples per K slot.
    """
    ipo: int
    aL: bool
    aR: bool
    exclass: int
    w_be_ep: int; w_be_cp: int; w_cntbe_ep: int; w_cntbe_cp: int
    w_cr_ep: int; w_cr_cp: int; w_cntcr_ep: int; w_cntcr_cp: int
    w_cnte_ep: int; w_cnte_cp: int; w_zc: int
    x_be_ep: int; x_be_cp: int; x_cntbe_ep: int; x_cntbe_cp: int
    x_c2_ep: int; x_cntc2_ep: int
    x_cnte_ep: int; x_cnte_cp: int; x_zc: int
    x_tx_ep: int; x_tx_cp: int; x_txc_ep: int; x_txc_cp: int
    cross_cols: tuple
    ex_cols: tuple


@dataclass(frozen=True)
class ConvStatic:
    state: int
    bpl: int
    a_off: int
    lane: int
    frame_mode: int
    smin_col: int             # int-table columns
    smax_col: int
    gate_col: int
    variants: Tuple[VariantStatic, ...]
    hint: Optional[HintConvStatic] = None


@dataclass(frozen=True)
class ChainStatic:
    state: int
    emi_col: int


@dataclass(frozen=True)
class FixedStatic:
    state: int
    jump: int
    kind: int
    lane: int
    emi_col: int
    extra_col: int            # kind1: log(1-psi); kind2: log geo->ass; else -1


@dataclass(frozen=True)
class LessDStatic:
    state: int
    lane: int
    window: int
    cum_id: int               # row in cum_all
    cumj_col: int             # scalar col: cum[c(j), j+1]
    psi_col: int              # scalar col: log psi[c(j)]
    jsel_col: int             # int col
    jgate_col: int            # int col
    lenvec_key: str


@dataclass(frozen=True)
class PinnedStatic:
    state: int
    lane: int
    score_col: int
    eop_col: int              # int col


@dataclass(frozen=True)
class ScanStatic:
    n: int
    S: int
    NL: int
    C: int
    PAD: int
    GPAD: int
    NSC: int
    NIC: int
    chain: Tuple[ChainStatic, ...]
    fixed: Tuple[FixedStatic, ...]
    lessd: Tuple[LessDStatic, ...]
    pinned: Tuple[PinnedStatic, ...]
    convs: Tuple[ConvStatic, ...]
    cls_col: int              # int col of the GC class
    NHW: int = 0              # hint window rows in hw_all
    hint_lm: Optional[tuple] = None   # (lm_ep, lm_cp, lm_exon, lm_CDS,
    #                                    lm_local_cp)


def split_tracks(tr: DPTracks):
    """(static, arrays) decomposition with scalar-table consolidation.

    xp-generic: under the device prep path (engine/jgold) the per-base
    arrays are jax tracers and the consolidation runs inside the jit."""
    from . import xputil as U
    xp = U.A.xp
    GPAD = tr.gpad
    PAD = GPAD
    C = tr.n_classes
    n = tr.n
    cls = tr.stairs.astype(np.int64)
    pos = U.arange(n)

    # columns are collected contiguously and stacked once at the end:
    # writing them straight into a row-major (n, NSC) buffer looks
    # cheaper but the strided a[:, k] stores are cache-hostile at Mb
    # scale (measured 2x slower than np.stack's blocked transpose)
    scal_cols: List[np.ndarray] = []
    int_cols: List[np.ndarray] = []

    def scol(values: np.ndarray) -> int:
        scal_cols.append(xp.asarray(values).astype(np.float32))
        return len(scal_cols) - 1

    def icol(values: np.ndarray) -> int:
        int_cols.append(xp.asarray(values).astype(np.int32))
        return len(int_cols) - 1

    cls_col = icol(cls)

    arrays: Dict[str, object] = {}
    arrays["log_trans"] = tr.log_trans
    arrays["log_init"] = tr.log_init
    arrays["log_term"] = tr.log_term
    arrays["lane_trans"] = tr.lane_trans

    # ---- chain / fixed -------------------------------------------------
    chain_s = tuple(ChainStatic(cs.state, scol(U.class_pick(cs.emi, cls)))
                    for cs in tr.chain)
    fixed_s = []
    for fs in tr.fixed:
        extra = -1
        if fs.kind == 1:
            extra = scol(U.class_pick(xp.asarray(tr.log_1mpsi)[:, None]
                                      + xp.zeros((1, n)), cls))
        elif fs.kind == 2:
            extra = scol(U.class_pick(
                xp.asarray(tr.log_geo_ass)[:, fs.state][:, None]
                + xp.zeros((1, n)), cls))
        fixed_s.append(FixedStatic(fs.state, fs.jump, fs.kind, fs.lane,
                                   scol(U.class_pick(fs.emi, cls)), extra))

    # ---- pool partition ------------------------------------------------
    g_ids, cum_ids = [], []
    for ecs in tr.exon_conv:
        for var in ecs.variants:
            if var.g_id not in g_ids:
                g_ids.append(var.g_id)
    for ls in tr.lessd:
        if ls.cum_id not in cum_ids:
            cum_ids.append(ls.cum_id)
    g_map = {pid: i for i, pid in enumerate(g_ids)}
    cum_map = {pid: i for i, pid in enumerate(cum_ids)}

    def pad_last(arr, fill=F32_NEG):
        front = arr.shape[:-1] + (GPAD,)
        back = arr.shape[:-1] + (END_PAD,)
        return xp.concatenate(
            [xp.full(front, fill, dtype=arr.dtype), arr,
             xp.full(back, fill, dtype=arr.dtype)], axis=-1)

    ext_len = GPAD + n + END_PAD
    G_list = []
    for pid in g_ids:
        a = tr.pool[pid]
        if a.shape[1] == 1:
            a = xp.broadcast_to(a, (a.shape[0], 3, a.shape[2]))
        if a.shape[0] == 1:
            a = xp.broadcast_to(a, (C,) + a.shape[1:])
        if a.shape[-1] == ext_len:    # already on the extended begin domain
            G_list.append(xp.asarray(a))
        else:
            G_list.append(pad_last(xp.asarray(a)))
    arrays["G_all"] = xp.stack(G_list) if G_list else \
        np.zeros((0, C, 3, GPAD + n + END_PAD), np.float32)
    arrays["cum_all"] = xp.stack(
        [pad_last(tr.pool[pid]) for pid in cum_ids]) if cum_ids else \
        np.zeros((0, C, GPAD + n + 1 + END_PAD), np.float32)

    # H factors become scalar columns (class baked in)
    h_cols: Dict[int, int] = {}

    def h_col(pid: int) -> int:
        if pid not in h_cols:
            a = tr.pool[pid]
            if a.shape[0] == 1:
                vals = a[0]
            else:
                vals = U.class_pick(a, cls)
            h_cols[pid] = scol(vals)
        return h_cols[pid]

    # ---- lessD ---------------------------------------------------------
    lessd_s = []
    for li, ls in enumerate(tr.lessd):
        cum = tr.pool[ls.cum_id]      # (C, n+1)
        cumj = U.class_pick(U.sg(cum, 1, n), cls)
        lessd_s.append(LessDStatic(
            state=ls.state, lane=ls.lane, window=ls.window,
            cum_id=cum_map[ls.cum_id], cumj_col=scol(cumj),
            psi_col=scol(U.class_pick(xp.asarray(tr.log_psi)[:, None]
                                      + xp.zeros((1, n)), cls)),
            jsel_col=icol(ls.j_stopsel), jgate_col=icol(ls.j_gate),
            lenvec_key=f"lessd{li}_lenvec"))
        arrays[f"lessd{li}_lenvec"] = ls.lenvec[::-1].copy()
    if tr.lessd:
        arrays["lessd_bvalid_all"] = xp.stack([
            xp.concatenate([xp.zeros(PAD, np.int8),
                            ls.b_valid.astype(np.int8),
                            xp.zeros(END_PAD, np.int8)])
            for ls in tr.lessd])
        arrays["lessd_bstop_all"] = xp.stack([
            xp.concatenate([xp.zeros(PAD, np.int8),
                            xp.asarray(ls.b_stopflag).astype(np.int8),
                            xp.zeros(END_PAD, np.int8)])
            for ls in tr.lessd])

    # ---- pinned --------------------------------------------------------
    pinned_s = tuple(PinnedStatic(
        state=ps.state, lane=ps.lane,
        score_col=scol(U.class_pick(ps.score, cls)), eop_col=icol(ps.eop))
        for ps in tr.exon_pinned)

    # ---- sparse exon-hint machinery --------------------------------------
    ht = tr.hint_tables
    hw_rows: List[np.ndarray] = []
    hw_ids: Dict[tuple, int] = {}
    xcol_cache: Dict[tuple, int] = {}
    ccol_cache: Dict[tuple, tuple] = {}
    ecol_cache: Dict[tuple, tuple] = {}

    def hw_row(strand, name):
        key = (strand, name)
        if key not in hw_ids:
            hw_ids[key] = len(hw_rows)
            hw_rows.append(np.asarray(ht[strand].wrows[name], np.float32))
        return hw_ids[key]

    def xcol(strand, bo, name):
        # x = j + bo may exceed n-1 for end-truncated exons: cumulative
        # tracks saturate at n-1 (crossing-type tracks are 0 there anyway);
        # x < 0 candidates are gated off upstream, value 0
        key = (strand, bo, name)
        if key not in xcol_cache:
            xr = np.asarray(ht[strand].xrows[name], np.float64)
            xi = pos + bo
            vals = np.where(xi >= 0, xr[np.clip(xi, 0, n - 1)], 0.0)
            xcol_cache[key] = scol(vals)
        return xcol_cache[key]

    def cross_cols(strand, bo):
        key = (strand, bo)
        if key not in ccol_cache:
            t = ht[strand]
            xi = pos + bo
            ok = (xi >= 0) & (xi < n)
            xc = np.clip(xi, 0, n - 1)
            cols = []
            for k in range(t.cross_start.shape[1]):
                si = icol(np.where(ok, t.cross_start[xc, k], -(1 << 30)))
                wi = scol(np.where(ok, t.cross_w[xc, k], 0.0))
                fi = icol(np.where(ok, t.cross_flag[xc, k], 0))
                cols.append((si, wi, fi))
            ccol_cache[key] = tuple(cols)
        return ccol_cache[key]

    def ex_cols(strand, bo):
        key = (strand, bo)
        if key not in ecol_cache:
            t = ht[strand]
            xi = pos + bo
            ok = (xi >= 0) & (xi < n)
            xc = np.clip(xi, 0, n - 1)
            cols = []
            for k in range(t.ex_pos.shape[1]):
                pi = icol(np.where(ok, t.ex_pos[xc, k], -(1 << 30)))
                wi = scol(np.where(ok, t.ex_w[xc, k], 0.0))
                ki = icol(np.where(ok, t.ex_kind[xc, k], 0))
                cols.append((pi, wi, ki))
            ecol_cache[key] = tuple(cols)
        return ecol_cache[key]

    def hint_static(ecs) -> Optional[HintConvStatic]:
        if ht is None or ecs.hint_strand is None:
            return None
        s_, bo = ecs.hint_strand, ecs.hint_bo
        return HintConvStatic(
            ipo=ecs.hint_ipo, aL=ecs.hint_aL, aR=ecs.hint_aR,
            exclass=ecs.hint_exclass,
            w_be_ep=hw_row(s_, "BE_ep"), w_be_cp=hw_row(s_, "BE_cp"),
            w_cntbe_ep=hw_row(s_, "CntBE_ep"),
            w_cntbe_cp=hw_row(s_, "CntBE_cp"),
            w_cr_ep=hw_row(s_, "CR_ep"), w_cr_cp=hw_row(s_, "CR_cp"),
            w_cntcr_ep=hw_row(s_, "CntCR_ep"),
            w_cntcr_cp=hw_row(s_, "CntCR_cp"),
            w_cnte_ep=hw_row(s_, "CntE_ep"), w_cnte_cp=hw_row(s_, "CntE_cp"),
            w_zc=hw_row(s_, "ZC"),
            x_be_ep=xcol(s_, bo, "BE_ep"), x_be_cp=xcol(s_, bo, "BE_cp"),
            x_cntbe_ep=xcol(s_, bo, "CntBE_ep"),
            x_cntbe_cp=xcol(s_, bo, "CntBE_cp"),
            x_c2_ep=xcol(s_, bo, "C2_ep"),
            x_cntc2_ep=xcol(s_, bo, "CntC2_ep"),
            x_cnte_ep=xcol(s_, bo, "CntE_ep"),
            x_cnte_cp=xcol(s_, bo, "CntE_cp"), x_zc=xcol(s_, bo, "ZC"),
            x_tx_ep=xcol(s_, bo, "TX_ep"), x_tx_cp=xcol(s_, bo, "TX_cp"),
            x_txc_ep=xcol(s_, bo, "TXc_ep"), x_txc_cp=xcol(s_, bo, "TXc_cp"),
            cross_cols=cross_cols(s_, bo), ex_cols=ex_cols(s_, bo))

    # ---- convs ---------------------------------------------------------
    convs = []
    for ei, ecs in enumerate(tr.exon_conv):
        win = tr.gold.geom[ST(ecs.etype)].win if ecs.frame_mode else 0
        vs = []
        for vi, var in enumerate(ecs.variants):
            width = var.len_hi - var.len_lo + 1
            if ecs.frame_mode == 0:
                fsel = None
            elif ecs.frame_mode == 1:
                r0 = (win - var.len_hi) % 3
                fsel = tuple(int((r0 + w) % 3) for w in range(width))
            else:
                r0 = (win + var.len_hi) % 3
                fsel = tuple(int((r0 - w) % 3) for w in range(width))
            vs.append(VariantStatic(g_id=g_map[var.g_id],
                                    h_col=h_col(var.h_id),
                                    len_lo=var.len_lo, len_hi=var.len_hi,
                                    width=width, fsel=fsel,
                                    vb_lo=var.vb_lo, vb_hi=var.vb_hi))
            arrays[f"lenvec{ei}_{vi}"] = var.lenvec[::-1].copy()
        # phi(j) and the end gate packed into one int column
        if ecs.phase_sign < 0:
            phi = (ecs.phase_const - pos) % 3
        else:
            phi = (ecs.phase_const + pos) % 3
        convs.append(ConvStatic(
            state=ecs.state, bpl=ecs.bpl, a_off=ecs.a_off, lane=ecs.lane,
            frame_mode=ecs.frame_mode,
            smin_col=icol(ecs.start_min), smax_col=icol(ecs.start_max),
            gate_col=icol(ecs.end_gate.astype(np.int32) +
                          (phi.astype(np.int32) << 1)),
            variants=tuple(vs), hint=hint_static(ecs)))

    arrays["scalar_table"] = xp.stack(scal_cols, axis=1)    # (n, NSC)
    arrays["int_table"] = xp.stack(int_cols, axis=1)        # (n, NIC)
    arrays["hw_all"] = xp.stack(hw_rows) if hw_rows else \
        np.zeros((0, GPAD + n + END_PAD), np.float32)
    arrays["n_true"] = np.int32(n)      # overwritten by bucketed callers

    hint_lm = None
    if tr.hint_lm is not None:
        hint_lm = (tr.hint_lm["exonpart"], tr.hint_lm["CDSpart"],
                   tr.hint_lm["exon"], tr.hint_lm["CDS"],
                   tr.hint_lm["local_cp"])
    static = ScanStatic(
        n=n, S=tr.S, NL=tr.n_lanes, C=C, PAD=PAD, GPAD=GPAD,
        NSC=len(scal_cols), NIC=len(int_cols),
        chain=chain_s, fixed=tuple(fixed_s), lessd=tuple(lessd_s),
        pinned=pinned_s, convs=tuple(convs), cls_col=cls_col,
        NHW=len(hw_rows), hint_lm=hint_lm)
    return static, arrays


def _hint_quot(st: ScanStatic, hs: HintConvStatic, HWwin, srow, irow,
               goff: int, width: int, b, widx, len_hi: int):
    """Exonpart/CDSpart/exon/CDS hint quotient over one conv band
    (gold._exon_part_quot, reference exonmodel.cc:1769-1860)."""
    lm_ep, lm_cp, lm_ex, lm_cds, lm_loc = st.hint_lm
    ipo = hs.ipo
    o1 = goff - ipo - 1              # window col offset for bob - 1
    o2 = goff - ipo                  # bob

    def WR(row, off):
        return HWwin[row, off: off + width]

    bob = b - ipo
    # covering sums: TX(x) minus crossing entries with start >= bob
    cov_ep = srow[hs.x_tx_ep]
    cov_cp = srow[hs.x_tx_cp]
    covc_ep = srow[hs.x_txc_ep]
    covc_cp = srow[hs.x_txc_cp]
    for (sc_, wc_, fc_) in hs.cross_cols:
        sk, wk, fl = irow[sc_], srow[wc_], irow[fc_]
        sub = (sk >= bob).astype(jnp.float32)
        cov_ep = cov_ep - jnp.where(fl == 1, wk, 0.0) * sub
        covc_ep = covc_ep - jnp.where(fl == 1, 1.0, 0.0) * sub
        cov_cp = cov_cp - jnp.where(fl == 2, wk, 0.0) * sub
        covc_cp = covc_cp - jnp.where(fl == 2, 1.0, 0.0) * sub
    crw_ep = WR(hs.w_cr_ep, o2)
    inside_ep = srow[hs.x_be_ep] - WR(hs.w_be_ep, o1) - crw_ep + cov_ep
    inside_cp = srow[hs.x_be_cp] - WR(hs.w_be_cp, o1) - \
        WR(hs.w_cr_cp, o2) + cov_cp
    ccw_ep = WR(hs.w_cntcr_ep, o2)
    cin_ep = srow[hs.x_cntbe_ep] - WR(hs.w_cntbe_ep, o1) - ccw_ep + covc_ep
    cin_cp = srow[hs.x_cntbe_cp] - WR(hs.w_cntbe_cp, o1) - \
        WR(hs.w_cntcr_cp, o2) + covc_cp
    part_bonus = inside_ep + inside_cp
    nep = cin_ep + cin_cp
    if hs.aL:       # exonpart ending inside a begin-anchored exon: sqrt
        part_bonus = part_bonus + 0.5 * (crw_ep - cov_ep)
        nep = nep + (ccw_ep - covc_ep)
    if hs.aR:       # exonpart starting inside an end-anchored exon
        part_bonus = part_bonus + 0.5 * (srow[hs.x_c2_ep] - cov_ep)
        nep = nep + (srow[hs.x_cntc2_ep] - covc_ep)
    quot = part_bonus

    # exact boundary matches + support maluses
    sup_ex = jnp.zeros((width,), jnp.float32)
    sup_cds = jnp.zeros((width,), jnp.float32)
    for (pc_, wc_, kc_) in hs.ex_cols:
        pk, wk, kd = irow[pc_], srow[wc_], irow[kc_]
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
    if hs.exclass == 2:      # exon hint anchored at begin, ending beyond
        for (sc_, wc_, fc_) in hs.cross_cols:
            sk, wk, fl = irow[sc_], srow[wc_], irow[fc_]
            cond = ((fl == 4) & (bob == sk)).astype(jnp.float32)
            quot = quot + 0.5 * wk * cond
            sup_ex = jnp.maximum(sup_ex, cond)
    quot = quot + lm_ex * (1.0 - sup_ex) + lm_cds * (1.0 - sup_cds)

    # per-base part maluses, clamped at zero uncovered length
    lenv = jnp.float32(len_hi) - widx.astype(jnp.float32)
    d_ep = lenv - (srow[hs.x_cnte_ep] - WR(hs.w_cnte_ep, o1))
    d_cp = lenv - (srow[hs.x_cnte_cp] - WR(hs.w_cnte_cp, o1))
    quot = quot + jnp.where(d_ep > 0, d_ep * lm_ep, 0.0)
    quot = quot + jnp.where(d_cp > 0, d_cp * lm_cp, 0.0)

    # local malus for partially, unevenly supported CDS (nep >= 5)
    zc = srow[hs.x_zc] - WR(hs.w_zc, o1)
    lpm = jnp.where(zc > 0, zc * lm_loc, 0.0)
    lpm = jnp.maximum(lpm, -part_bonus)
    quot = quot + jnp.where(nep >= 4.5, lpm, 0.0)
    return quot


def make_scan_fn(st: ScanStatic, debug_vals: bool = False):
    """Build the pure scan function fn(arrays, v0) -> (v_final, backptrs).

    Per step, exactly one dynamic window slice is taken from each large
    buffer (lane values, lane args, G pool, cumsums, lessD masks, scalar/int
    tables); every per-state/variant read is then a *static* slice of those
    windows, which XLA fuses into a handful of kernels — this is what makes
    the sequential scan viable on TPU.
    """
    n, S, NL, PAD, GPAD = st.n, st.S, st.NL, st.PAD, st.GPAD
    WB = PAD                      # superwindow back-extent (rows j-WB .. j-1)

    def fn(arrays, v0):
        G_all = arrays["G_all"]
        cum_all = arrays["cum_all"]
        log_trans = arrays["log_trans"]
        lane_trans = arrays["lane_trans"]
        stab = arrays["scalar_table"]
        itab = arrays["int_table"]
        NG = G_all.shape[0]
        NCU = cum_all.shape[0]

        n_true = arrays["n_true"]

        def step(carry, j):
            vprev, lanes, lane_arg = carry
            srow = stab[j]
            irow = itab[j]
            c = irow[st.cls_col]
            ltc = log_trans[c]

            # ---- superwindows (one dynamic slice per buffer) -----------
            Lwin = jax.lax.dynamic_slice(lanes, (0, j - WB + PAD), (NL, WB))
            Awin = jax.lax.dynamic_slice(lane_arg, (0, j - WB + PAD),
                                         (NL, WB))
            if NG:
                Gwin = jax.lax.dynamic_slice(
                    G_all, (0, c, 0, j - WB + GPAD), (NG, 1, 3, WB + 64)
                )[:, 0]                                   # (NG, 3, WB+64)
            if NCU:
                Cwin = jax.lax.dynamic_slice(
                    cum_all, (0, c, j - WB + GPAD), (NCU, 1, WB + 64))[:, 0]
            if st.lessd:
                NLD = arrays["lessd_bvalid_all"].shape[0]
                BVwin = jax.lax.dynamic_slice(
                    arrays["lessd_bvalid_all"], (0, j - WB + PAD), (NLD, WB))
                BSwin = jax.lax.dynamic_slice(
                    arrays["lessd_bstop_all"], (0, j - WB + PAD), (NLD, WB))
            if st.NHW:
                HWwin = jax.lax.dynamic_slice(
                    arrays["hw_all"], (0, j - WB + GPAD), (st.NHW, WB + 64))

            put_idx: list = []
            put_val: list = []
            put_bp: list = []

            def put(_v, _b, s, v, pred, off):
                put_idx.append(s)
                put_val.append(v)
                put_bp.append((pred << 20) | off)
                return _v, _b

            vals = bps = None

            # ---- chain -------------------------------------------------
            for csd in st.chain:
                s = csd.state
                cand = vprev + ltc[:, s]
                arg = jnp.argmax(cand)
                best = cand[arg]
                v = jnp.where(best > GATE, best + srow[csd.emi_col], NEG)
                vals, bps = put(vals, bps, s, v, arg, 1)

            # ---- fixed -------------------------------------------------
            for fsd in st.fixed:
                s, D, l = fsd.state, fsd.jump, fsd.lane
                col = WB - D
                emi = srow[fsd.emi_col]
                if fsd.kind == 0:
                    lv = Lwin[l, col]
                    la = Awin[l, col]
                elif fsd.kind == 1:
                    lv = Lwin[l, col] + srow[fsd.extra_col]
                    la = Awin[l, col]
                else:
                    A = Lwin[l, col]
                    B = Lwin[l + 1, col] + srow[fsd.extra_col]
                    lv = jnp.maximum(A, B)
                    la = jnp.where(B > A, Awin[l + 1, col], Awin[l, col])
                ok = (j >= D) & (lv > GATE) & (emi > GATE)
                v = jnp.where(ok, lv + emi, NEG)
                vals, bps = put(vals, bps, s, v, la.astype(jnp.int32), D)

            # ---- lessD -------------------------------------------------
            for li, lsd in enumerate(st.lessd):
                s, l, W = lsd.state, lsd.lane, lsd.window
                c0 = WB - W                    # col of eop = j - W
                lslice = Lwin[l, c0: WB]
                aslice = Awin[l, c0: WB]
                cslice = Cwin[lsd.cum_id, c0 + 1: WB + 1]
                seg = srow[lsd.cumj_col] - cslice
                bvalid = BVwin[li, c0: WB]
                bstop = BSwin[li, c0: WB]
                widx = jax.lax.iota(jnp.int32, W)
                eops = (j - W) + widx
                stop = (bstop & irow[lsd.jsel_col].astype(jnp.int8)) != 0
                ok = (eops >= 0) & (bvalid != 0) & (~stop)
                score = jnp.where(ok & (lslice > GATE),
                                  lslice + seg + arrays[lsd.lenvec_key] +
                                  srow[lsd.psi_col], NEG)
                best = jnp.max(score)
                widx2 = jax.lax.iota(jnp.int32, W)
                ridx = jnp.max(jnp.where(score == best, widx2, -1))
                ridx = jnp.maximum(ridx, 0)
                gated = (irow[lsd.jgate_col] != 0) & (best > GATE)
                v = jnp.where(gated, best, NEG)
                pred = aslice[ridx].astype(jnp.int32)
                vals, bps = put(vals, bps, s, v, pred, W - ridx)

            # ---- pinned (dynamic far-back row reads) -------------------
            for psd in st.pinned:
                s, l = psd.state, psd.lane
                eop = irow[psd.eop_col]
                sc = srow[psd.score_col]
                row = jnp.maximum(eop, -PAD) + PAD
                lv = lanes[l, row]
                la = lane_arg[l, row]
                ok = (sc > GATE) & (lv > GATE)
                v = jnp.where(ok, lv + sc, NEG)
                vals, bps = put(vals, bps, s, v, la.astype(jnp.int32),
                                j - eop)

            # ---- exon convs --------------------------------------------
            for ei, ecs in enumerate(st.convs):
                s = ecs.state
                gp = irow[ecs.gate_col]
                gate = (gp & 1) != 0
                phi = gp >> 1
                smin = irow[ecs.smin_col]
                smax = irow[ecs.smax_col]
                ph_onehot = (phi == jnp.arange(3)).astype(jnp.float32)

                def compute(j=j, ecs=ecs, ei=ei, smin=smin, smax=smax,
                            srow=srow, ph_onehot=ph_onehot):
                    best = NEG
                    bpred = jnp.int32(0)
                    boff = jnp.int32(1)
                    for vi, var in enumerate(ecs.variants):
                        width = var.width
                        lvd = arrays[f"lenvec{ei}_{vi}"]
                        goff = WB + ecs.a_off - var.len_hi
                        G3 = Gwin[var.g_id, :, goff: goff + width]  # (3, w)
                        G = (G3 * ph_onehot[:, None]).sum(axis=0)
                        H = srow[var.h_col]
                        eoff = goff - ecs.bpl - 1
                        if var.fsel is None:
                            L = Lwin[ecs.lane, eoff: eoff + width]
                            A = Awin[ecs.lane, eoff: eoff + width]
                        else:
                            L3 = Lwin[ecs.lane: ecs.lane + 3,
                                      eoff: eoff + width]
                            A3 = Awin[ecs.lane: ecs.lane + 3,
                                      eoff: eoff + width]
                            onehot = jnp.asarray(
                                np.eye(3, dtype=np.float32)[
                                    np.array(var.fsel)].T)     # (3, w)
                            L = (L3 * onehot).sum(axis=0)
                            A = (A3 * onehot.astype(jnp.int8)).sum(
                                axis=0).astype(jnp.int8)
                        widx = jax.lax.iota(jnp.int32, width)
                        b = (j + ecs.a_off - var.len_hi) + widx
                        okb = (b >= smin) & (b <= smax)
                        if var.vb_lo is not None:
                            okb &= b >= var.vb_lo
                        if var.vb_hi is not None:
                            okb &= b <= var.vb_hi
                        if ecs.hint is not None:
                            quot = _hint_quot(st, ecs.hint, HWwin, srow,
                                              irow, goff, width, b, widx,
                                              var.len_hi)
                        else:
                            quot = jnp.float32(0.0)
                        score = jnp.where(okb & (L > GATE) & (G > GATE),
                                          (L + G + lvd) + quot, NEG)
                        sbest = jnp.max(score)
                        ridx = jnp.max(jnp.where(score == sbest, widx, -1))
                        ridx = jnp.maximum(ridx, 0)
                        vbest = jnp.where((sbest > GATE) & (H > GATE),
                                          sbest + H, NEG)
                        take = vbest > best
                        best = jnp.where(take, vbest, best)
                        bpred = jnp.where(take, A[ridx].astype(jnp.int32),
                                          bpred)
                        boff = jnp.where(
                            take, (WB - eoff) - ridx, boff)
                    return best, bpred, boff

                # lax.cond (not masking): skipping gated-off conv states
                # is a measured 3x win on TPU -- the conv vector work is
                # the dominant per-step cost, and the gate is off at most
                # positions (no in-frame exon can end there)
                v, pred, off = jax.lax.cond(
                    gate, compute,
                    lambda: (NEG, jnp.int32(0), jnp.int32(1)))
                vals, bps = put(vals, bps, s, v, pred, off)

            idx = jnp.asarray(np.array(put_idx, dtype=np.int32))
            vals = jnp.full((S,), NEG).at[idx].set(jnp.stack(put_val))
            bps = jnp.zeros((S,), dtype=jnp.int32).at[idx].set(
                jnp.stack(put_bp))
            # padded-bucket tail: freeze the carry past the true length so
            # v_final is the value at n_true-1 (rows beyond are never read)
            vals = jnp.where(j < n_true, vals, vprev)
            lane_cand = vals[None, :] + lane_trans
            lane_argj = jnp.argmax(lane_cand, axis=1).astype(jnp.int8)
            lane_valj = jnp.max(lane_cand, axis=1)
            lanes = jax.lax.dynamic_update_slice(
                lanes, lane_valj[:, None], (0, j + PAD))
            lane_arg = jax.lax.dynamic_update_slice(
                lane_arg, lane_argj[:, None], (0, j + PAD))
            if debug_vals:
                return (vals, lanes, lane_arg), (bps, vals)
            return (vals, lanes, lane_arg), bps

        lanes0 = jnp.full((NL, n + PAD + END_PAD), NEG, dtype=jnp.float32)
        lane_arg0 = jnp.zeros((NL, n + PAD + END_PAD), dtype=jnp.int8)
        lane_cand = v0[None, :] + arrays["lane_trans"]
        l0 = jnp.max(lane_cand, axis=1)
        a0 = jnp.argmax(lane_cand, axis=1).astype(jnp.int8)
        lanes0 = lanes0.at[:, : PAD + 1].set(l0[:, None])
        lane_arg0 = lane_arg0.at[:, : PAD + 1].set(a0[:, None])
        (vfin, _, _), bps = jax.lax.scan(
            step, (v0, lanes0, lane_arg0), jnp.arange(1, n))
        return vfin, bps

    return fn


def make_forward_fn(st: ScanStatic):
    """Forward-table scan: same candidate sets/tracks as make_scan_fn with
    max replaced by logsumexp (reference computes the forward table with
    the identical recursion, src/namgene.cc:367; gold._state_cands is the
    host oracle).  The baseline rebase is a per-position constant shift,
    so it commutes with logsumexp exactly — the rebased tracks are reused
    unchanged and the host adds tracks.base back.

    Returns fn(arrays, v0) -> (f_final (S,), f_rows (n-1, S)).
    """
    n, S, NL, PAD, GPAD = st.n, st.S, st.NL, st.PAD, st.GPAD
    WB = PAD

    def lse_vec(x):
        m = jnp.max(x)
        s = jnp.sum(jnp.where(x > GATE, jnp.exp(x - m), 0.0))
        return jnp.where(m > GATE, m + jnp.log(s), NEG)

    def lse2(a, b):
        m = jnp.maximum(a, b)
        s = jnp.where(a > GATE, jnp.exp(a - m), 0.0) + \
            jnp.where(b > GATE, jnp.exp(b - m), 0.0)
        return jnp.where(m > GATE, m + jnp.log(s), NEG)

    def fn(arrays, v0):
        G_all = arrays["G_all"]
        cum_all = arrays["cum_all"]
        log_trans = arrays["log_trans"]
        lane_trans = arrays["lane_trans"]
        stab = arrays["scalar_table"]
        itab = arrays["int_table"]
        NG = G_all.shape[0]
        NCU = cum_all.shape[0]
        n_true = arrays["n_true"]

        def step(carry, j):
            vprev, lanes = carry
            srow = stab[j]
            irow = itab[j]
            c = irow[st.cls_col]
            ltc = log_trans[c]

            Lwin = jax.lax.dynamic_slice(lanes, (0, j - WB + PAD), (NL, WB))
            if NG:
                Gwin = jax.lax.dynamic_slice(
                    G_all, (0, c, 0, j - WB + GPAD), (NG, 1, 3, WB + 64)
                )[:, 0]
            if NCU:
                Cwin = jax.lax.dynamic_slice(
                    cum_all, (0, c, j - WB + GPAD), (NCU, 1, WB + 64))[:, 0]
            if st.lessd:
                NLD = arrays["lessd_bvalid_all"].shape[0]
                BVwin = jax.lax.dynamic_slice(
                    arrays["lessd_bvalid_all"], (0, j - WB + PAD), (NLD, WB))
                BSwin = jax.lax.dynamic_slice(
                    arrays["lessd_bstop_all"], (0, j - WB + PAD), (NLD, WB))
            if st.NHW:
                HWwin = jax.lax.dynamic_slice(
                    arrays["hw_all"], (0, j - WB + GPAD), (st.NHW, WB + 64))

            put_idx: list = []
            put_val: list = []

            for csd in st.chain:
                cand = lse_vec(vprev + ltc[:, csd.state])
                v = jnp.where(cand > GATE, cand + srow[csd.emi_col], NEG)
                put_idx.append(csd.state)
                put_val.append(v)

            for fsd in st.fixed:
                s, D, l = fsd.state, fsd.jump, fsd.lane
                col = WB - D
                emi = srow[fsd.emi_col]
                if fsd.kind == 0:
                    lv = Lwin[l, col]
                elif fsd.kind == 1:
                    lv = Lwin[l, col] + srow[fsd.extra_col]
                else:
                    lv = lse2(Lwin[l, col],
                              Lwin[l + 1, col] + srow[fsd.extra_col])
                ok = (j >= D) & (lv > GATE) & (emi > GATE)
                put_idx.append(s)
                put_val.append(jnp.where(ok, lv + emi, NEG))

            for li, lsd in enumerate(st.lessd):
                s, l, Wn = lsd.state, lsd.lane, lsd.window
                c0 = WB - Wn
                lslice = Lwin[l, c0: WB]
                cslice = Cwin[lsd.cum_id, c0 + 1: WB + 1]
                seg = srow[lsd.cumj_col] - cslice
                bvalid = BVwin[li, c0: WB]
                bstop = BSwin[li, c0: WB]
                widx = jax.lax.iota(jnp.int32, Wn)
                eops = (j - Wn) + widx
                stop = (bstop & irow[lsd.jsel_col].astype(jnp.int8)) != 0
                ok = (eops >= 0) & (bvalid != 0) & (~stop)
                score = jnp.where(ok & (lslice > GATE),
                                  lslice + seg + arrays[lsd.lenvec_key] +
                                  srow[lsd.psi_col], NEG)
                v = lse_vec(score)
                gated = (irow[lsd.jgate_col] != 0) & (v > GATE)
                put_idx.append(s)
                put_val.append(jnp.where(gated, v, NEG))

            for psd in st.pinned:
                s, l = psd.state, psd.lane
                eop = irow[psd.eop_col]
                sc = srow[psd.score_col]
                row = jnp.maximum(eop, -PAD) + PAD
                lv = lanes[l, row]
                ok = (sc > GATE) & (lv > GATE)
                put_idx.append(s)
                put_val.append(jnp.where(ok, lv + sc, NEG))

            for ei, ecs in enumerate(st.convs):
                s = ecs.state
                gp = irow[ecs.gate_col]
                gate = (gp & 1) != 0
                phi = gp >> 1
                smin = irow[ecs.smin_col]
                smax = irow[ecs.smax_col]
                ph_onehot = (phi == jnp.arange(3)).astype(jnp.float32)

                def compute(j=j, ecs=ecs, ei=ei, smin=smin, smax=smax,
                            srow=srow, irow=irow, ph_onehot=ph_onehot):
                    best = NEG
                    for vi, var in enumerate(ecs.variants):
                        width = var.width
                        lvd = arrays[f"lenvec{ei}_{vi}"]
                        goff = WB + ecs.a_off - var.len_hi
                        G3 = Gwin[var.g_id, :, goff: goff + width]
                        G = (G3 * ph_onehot[:, None]).sum(axis=0)
                        H = srow[var.h_col]
                        eoff = goff - ecs.bpl - 1
                        if var.fsel is None:
                            L = Lwin[ecs.lane, eoff: eoff + width]
                        else:
                            L3 = Lwin[ecs.lane: ecs.lane + 3,
                                      eoff: eoff + width]
                            onehot = jnp.asarray(
                                np.eye(3, dtype=np.float32)[
                                    np.array(var.fsel)].T)
                            L = (L3 * onehot).sum(axis=0)
                        widx = jax.lax.iota(jnp.int32, width)
                        b = (j + ecs.a_off - var.len_hi) + widx
                        okb = (b >= smin) & (b <= smax)
                        if var.vb_lo is not None:
                            okb &= b >= var.vb_lo
                        if var.vb_hi is not None:
                            okb &= b <= var.vb_hi
                        if ecs.hint is not None:
                            quot = _hint_quot(st, ecs.hint, HWwin, srow,
                                              irow, goff, width, b, widx,
                                              var.len_hi)
                        else:
                            quot = jnp.float32(0.0)
                        score = jnp.where(okb & (L > GATE) & (G > GATE),
                                          (L + G + lvd) + quot, NEG)
                        sbest = lse_vec(score)
                        vbest = jnp.where((sbest > GATE) & (H > GATE),
                                          sbest + H, NEG)
                        best = lse2(best, vbest)
                    return best

                v = jax.lax.cond(gate, compute, lambda: NEG)
                put_idx.append(s)
                put_val.append(v)

            idx = jnp.asarray(np.array(put_idx, dtype=np.int32))
            vals = jnp.full((S,), NEG).at[idx].set(jnp.stack(put_val))
            vals = jnp.where(j < n_true, vals, vprev)
            lane_cand = vals[None, :] + lane_trans        # (NL, S)
            m = jnp.max(lane_cand, axis=1)
            ssum = jnp.sum(jnp.where(lane_cand > GATE,
                                     jnp.exp(lane_cand - m[:, None]), 0.0),
                           axis=1)
            lane_valj = jnp.where(m > GATE, m + jnp.log(ssum), NEG)
            lanes = jax.lax.dynamic_update_slice(
                lanes, lane_valj[:, None], (0, j + PAD))
            return (vals, lanes), vals

        lanes0 = jnp.full((NL, n + PAD + END_PAD), NEG, dtype=jnp.float32)
        lane_cand = v0[None, :] + arrays["lane_trans"]
        m0 = jnp.max(lane_cand, axis=1)
        s0 = jnp.sum(jnp.where(lane_cand > GATE,
                               jnp.exp(lane_cand - m0[:, None]), 0.0), axis=1)
        l0 = jnp.where(m0 > GATE, m0 + jnp.log(s0), NEG)
        lanes0 = lanes0.at[:, : PAD + 1].set(l0[:, None])
        (ffin, _), frows = jax.lax.scan(step, (v0, lanes0), jnp.arange(1, n))
        return ffin, frows

    return fn


_FWD_CACHE: Dict[ScanStatic, object] = {}


class ForwardEngine:
    """Device forward-table pass; fills gold.f for the host sampling walk
    (gold.sample_path), replacing the O(n·S·cands) pure-Python forward.

    Use on tracks already padded by a ScanEngine (or pass bucket=True to
    pad here); rows beyond n_true are frozen and dropped.
    """

    def __init__(self, tracks: DPTracks, n_true: Optional[int] = None,
                 bucket: bool = False):
        from .device import bucket_length, pad_tracks, UnsupportedByDevice
        self.n_true = tracks.n if n_true is None else n_true
        if bucket:
            pad_tracks(tracks, bucket_length(tracks.n))
        self.tracks = tracks
        self.static, self.arrays = split_tracks(tracks)
        self.arrays["n_true"] = np.int32(self.n_true)
        # sampling-temperature heating (reference types.hh:387): every
        # candidate total is linear in the log-parameter tracks, so
        # transEmiProb^h == scaling every float log table by h.  The
        # sparse-hint machinery mixes COUNT columns into the scalar
        # table, which must not scale -> gold fallback there.
        self._heat = (8.0 - getattr(tracks.gold.cn, "temperature", 0)) / 8.0
        if self._heat != 1.0:
            if self.static.NHW:
                raise UnsupportedByDevice(
                    "temperature heating with sparse exon hints")
            a = dict(self.arrays)
            for k, v in list(a.items()):
                v = np.asarray(v)
                if v.dtype == np.float32 and k not in ("log_init",
                                                       "log_term"):
                    a[k] = (v * np.float32(self._heat)).astype(np.float32)
            self.arrays = a
        fn = _FWD_CACHE.get(self.static)
        if fn is None:
            fn = jax.jit(make_forward_fn(self.static))
            _FWD_CACHE[self.static] = fn
        self._fn = fn

    def run(self) -> np.ndarray:
        """Full forward table (n_true, S) in TRUE (unrebased) log space."""
        v0 = jnp.asarray(self.tracks.log_init)
        dev = jax.tree_util.tree_map(jnp.asarray, self.arrays)
        ffin, frows = self._fn(dev, v0)
        n = self.n_true
        f = np.full((n, self.tracks.S), float(F32_NEG), dtype=np.float64)
        f[0] = np.asarray(v0, dtype=np.float64)
        f[1:] = np.asarray(frows, dtype=np.float64)[: n - 1]
        base = np.asarray(self.tracks.base) * self._heat
        f = np.where(f > float(F32_NEG) / 2, f + base[:n, None], -np.inf)
        return f


_FN_CACHE: Dict[ScanStatic, object] = {}


class ScanEngine:
    """Single-sequence convenience wrapper around the pure scan function.

    Sequences are padded to bucketed lengths (device.bucket_length) and the
    compiled scan is cached on the hashable ScanStatic, so runs over many
    distinct sequence/piece lengths share a handful of compilations.
    """

    def __init__(self, tracks: DPTracks, bucket: bool = True):
        from .device import bucket_length, pad_tracks
        self.n_true = tracks.n
        if bucket:
            pad_tracks(tracks, bucket_length(tracks.n))
        self.tracks = tracks
        self.static, self.arrays = split_tracks(tracks)
        self.arrays["n_true"] = np.int32(self.n_true)
        self.n, self.S = self.n_true, tracks.S
        fn = _FN_CACHE.get(self.static)
        if fn is None:
            fn = jax.jit(make_scan_fn(self.static))
            _FN_CACHE[self.static] = fn
        self._fn = fn

    def run(self) -> None:
        v0 = jnp.asarray(self.tracks.log_init)
        dev_arrays = jax.tree_util.tree_map(jnp.asarray, self.arrays)
        vfin, bps = self._fn(dev_arrays, v0)
        self.v_final = np.asarray(vfin)
        self._bps_dev = bps          # stays on device (see engine/traceback)

    @property
    def backptr(self) -> np.ndarray:
        return np.asarray(self._bps_dev)

    def _walk_start(self) -> int:
        last = self.v_final + np.asarray(self.tracks.log_term)
        state = int(np.argmax(last))
        if last[state] <= float(F32_NEG) / 2:
            raise RuntimeError("No feasible path found in HMM (scan)")
        return state

    def _trace_packed(self):
        from .traceback import make_trace_fn
        state0 = self._walk_start()
        fn = make_trace_fn(self.n, -1)
        packed, final_base = fn(self._bps_dev, state0)
        return np.asarray(packed), int(final_base)

    def traceback(self) -> List[Tuple[int, int, ST]]:
        from .traceback import raw_segments
        packed, fb = self._trace_packed()
        return raw_segments(packed, fb, self.tracks.gold.sg.state_types)

    def traceback_path(self, dnalen: int):
        """Condensed PathState list; equals og.condense_path(traceback())."""
        from .traceback import condensed_path
        packed, fb = self._trace_packed()
        return condensed_path(packed, fb, dnalen,
                              self.tracks.gold.sg.state_types)
