"""JAX scan DP engine (single-chip fast path).

Runs the semi-Markov Viterbi as one `jax.lax.scan` over sequence positions.
Per position the work is fully vectorized:

  * chain states — dense (S,) max over the previous column,
  * fixed-length intron states — one lane read at j-D,
  * lessD introns — masked window max over the launch-lane buffer,
  * exon states — a list of banded max-plus convolutions (see
    engine/device.py) over the lane buffer, G tracks, and length
    distributions, gated by per-position end-signal feasibility.

Numerics are float32 in log space; scores are renormalized implicitly by the
bounded dependency window.  The backtracked path is re-scored on the host if
an exact path probability is needed.  The gold engine (engine/gold.py,
float64) is the parity oracle; this engine matches it everywhere except
float near-ties.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..model.state_config import ST
from .device import DPTracks, F32_NEG, ConvVariant, ExonConvState

NEG = jnp.float32(F32_NEG)
GATE = jnp.float32(-1.0e29)    # validity threshold (scores above are real)

# lane-buffer front padding: must cover the widest conv window so dynamic
# slices never clamp; rows [0, PAD] replicate position-0 lanes so any eop <= 0
# reads the initial column (reference uses viterbi[0] when endOfPred < 0,
# src/exonmodel.cc:1066).  Set per-engine from max_exon_len.
END_PAD = 64


def _prep_variant(ecs: ExonConvState, var: ConvVariant):
    """Static per-variant constants for the kernel."""
    width = var.len_hi - var.len_lo + 1
    # window in ascending b: w' = 0 .. width-1, b = b_lo + w',
    # len(w') = len_hi - w', b_lo = j + a_off - len_hi
    lenvec_desc = np.asarray(var.lenvec[::-1], dtype=np.float32)
    if ecs.frame_mode == 0:
        fsel = None
    else:
        if ecs.frame_mode == 1:
            r0 = (ecs.win - var.len_hi) % 3
            f = (r0 + np.arange(width)) % 3
        else:
            r0 = (ecs.win + var.len_hi) % 3
            f = (r0 - np.arange(width)) % 3
        fsel = f.astype(np.int32)     # (width,) required pred frame
    return width, lenvec_desc, fsel


class ScanEngine:
    """Compiled scan DP over one sequence's DPTracks."""

    def __init__(self, tracks: DPTracks):
        self.tracks = tracks
        tr = tracks
        n, S, NL = tr.n, tr.S, tr.n_lanes
        self.n, self.S, self.NL = n, S, NL

        # pool arrays padded front+back so window slices never clamp:
        # G pools are indexed by b + GPAD
        self.GPAD = tr.gold.exp.len_dist["internal"].shape[0] + 64
        self.PAD = self.GPAD
        pool_padded = []
        for arr in tr.pool:
            front = arr.shape[:-1] + (self.GPAD,)
            back = arr.shape[:-1] + (END_PAD,)
            pool_padded.append(np.concatenate(
                [np.full(front, F32_NEG, dtype=arr.dtype), arr,
                 np.full(back, F32_NEG, dtype=arr.dtype)], axis=-1))
        self.pool = [jnp.asarray(a) for a in pool_padded]

        self.static = {}
        for ecs in tr.exon_conv:
            self.static[ecs.state] = [
                _prep_variant(ecs, v) for v in ecs.variants]

        self._scan = jax.jit(self._build_scan())

    # ------------------------------------------------------------------
    def _build_scan(self):
        tr = self.tracks
        n, S, NL = self.n, self.S, self.NL
        C = tr.n_classes
        GPAD = self.GPAD
        pool = self.pool

        PAD = self.PAD
        stairs = jnp.asarray(tr.stairs)
        log_trans = jnp.asarray(tr.log_trans)          # (C, S, S)
        lane_trans = jnp.asarray(tr.lane_trans)        # (NL, S)
        log_psi = jnp.asarray(tr.log_psi)
        log_1mpsi = jnp.asarray(tr.log_1mpsi)
        log_geo_ass = jnp.asarray(tr.log_geo_ass)      # (C, S)

        chain_states = [cs.state for cs in tr.chain]
        chain_emi = jnp.asarray(np.stack([cs.emi for cs in tr.chain]))

        fixed_emi = jnp.asarray(np.stack([fs.emi for fs in tr.fixed]))
        lessd_data = []
        for ls in tr.lessd:
            lessd_data.append(dict(
                lenvec_asc=jnp.asarray(ls.lenvec[::-1]),
                b_valid=jnp.asarray(ls.b_valid),
                b_stop=jnp.asarray(ls.b_stopflag),
                j_gate=jnp.asarray(ls.j_gate),
                j_sel=jnp.asarray(ls.j_stopsel),
            ))
        pinned_eop = [jnp.asarray(ps.eop) for ps in tr.exon_pinned]
        pinned_score = [jnp.asarray(ps.score) for ps in tr.exon_pinned]
        conv_gate = [jnp.asarray(ecs.end_gate) for ecs in tr.exon_conv]
        conv_smin = [jnp.asarray(ecs.start_min) for ecs in tr.exon_conv]
        conv_smax = [jnp.asarray(ecs.start_max) for ecs in tr.exon_conv]
        conv_lenvec = {}
        conv_fsel = {}
        for ecs in tr.exon_conv:
            for vi, (width, lvd, fsel) in enumerate(self.static[ecs.state]):
                conv_lenvec[(ecs.state, vi)] = jnp.asarray(lvd)
                if fsel is not None:
                    conv_fsel[(ecs.state, vi)] = fsel   # numpy static

        def pool_at_b(gid, c, phi, b_lo, width):
            """Slice G[gid][c, phi, b_lo : b_lo+width] with front padding."""
            arr = pool[gid]
            ci = c if arr.shape[0] > 1 else 0
            if arr.ndim == 3:
                pi = phi if arr.shape[1] > 1 else 0
                return jax.lax.dynamic_slice(
                    arr, (ci, pi, b_lo + GPAD), (1, 1, width))[0, 0]
            return jax.lax.dynamic_slice(arr, (ci, b_lo + GPAD),
                                         (1, width))[0]

        def pool_at_j(hid, c, j):
            arr = pool[hid]
            ci = c if arr.shape[0] > 1 else 0
            return arr[ci, j + GPAD]

        def step(carry, j):
            vprev, lanes, lane_arg = carry
            c = stairs[j]
            ltc = log_trans[c]

            vals = jnp.full((S,), NEG)
            bps = jnp.zeros((S,), dtype=jnp.int32)

            def put(vals, bps, s, v, pred, off):
                return (vals.at[s].set(v),
                        bps.at[s].set((pred << 20) | off))

            # ---- chain states ----------------------------------------
            for ci_, cs in enumerate(tr.chain):
                s = cs.state
                cand = vprev + ltc[:, s]
                arg = jnp.argmax(cand)
                best = cand[arg]
                emi = chain_emi[ci_, c, j]
                v = jnp.where(best > GATE, best + emi, NEG)
                vals, bps = put(vals, bps, s, v, arg, 1)

            # ---- fixed states ----------------------------------------
            for fi, fs in enumerate(tr.fixed):
                s, D, l = fs.state, fs.jump, fs.lane
                eop = j - D
                row = eop + PAD
                emi = fixed_emi[fi, c, j]
                if fs.kind == 0:
                    lv = lanes[row, l]
                    la = lane_arg[row, l]
                elif fs.kind == 1:
                    lv = lanes[row, l] + log_1mpsi[c]
                    la = lane_arg[row, l]
                else:
                    A = lanes[row, l]
                    B = lanes[row, l + 1] + log_geo_ass[c, s]
                    lv = jnp.maximum(A, B)
                    la = jnp.where(B > A, lane_arg[row, l + 1],
                                   lane_arg[row, l])
                ok = (eop >= 0) & (lv > GATE) & (emi > GATE)
                v = jnp.where(ok, lv + emi, NEG)
                vals, bps = put(vals, bps, s, v, la.astype(jnp.int32), D)

            # ---- lessD states ----------------------------------------
            for li, ls in enumerate(tr.lessd):
                s, l, W = ls.state, ls.lane, ls.window
                dd = lessd_data[li]
                # ascending eop: eop(w) = j - W + w, w in [0, W)
                lo = j - W
                lslice = jax.lax.dynamic_slice(lanes, (lo + PAD, l), (W, 1)
                                               )[:, 0]
                aslice = jax.lax.dynamic_slice(lane_arg, (lo + PAD, l),
                                               (W, 1))[:, 0]
                cum = pool[ls.cum_id]      # (C, GPAD + n+1)
                cslice = jax.lax.dynamic_slice(
                    cum, (c, lo + 1 + GPAD), (1, W))[0]
                seg = cum[c, j + 1 + GPAD] - cslice
                bvalid = jax.lax.dynamic_slice(
                    _lessd_pad[li]["b_valid"], (lo + PAD,), (W,))
                bstop = jax.lax.dynamic_slice(
                    _lessd_pad[li]["b_stop"], (lo + PAD,), (W,))
                widx = jax.lax.iota(jnp.int32, W)
                eops = lo + widx
                stop = (bstop & dd["j_sel"][j]) != 0
                ok = (eops >= 0) & (eops <= j - 1) & (bvalid != 0) & (~stop)
                score = jnp.where(ok & (lslice > GATE) & (seg > GATE),
                                  lslice + seg + dd["lenvec_asc"] +
                                  log_psi[c], NEG)
                # prefer larger eop on ties (reference iterates eop desc)
                ridx = W - 1 - jnp.argmax(score[::-1])
                best = score[ridx]
                gated = dd["j_gate"][j] & (best > GATE)
                v = jnp.where(gated, best, NEG)
                pred = aslice[ridx].astype(jnp.int32)
                off = j - (lo + ridx)
                vals, bps = put(vals, bps, s, v, pred, off)

            # ---- pinned exon states ----------------------------------
            for pi, ps in enumerate(tr.exon_pinned):
                s, l = ps.state, ps.lane
                eop = pinned_eop[pi][j]
                sc = pinned_score[pi][c, j]
                row = jnp.maximum(eop, -PAD) + PAD
                lv = lanes[row, l]
                la = lane_arg[row, l]
                ok = (eop > -PAD) & (sc > GATE) & (lv > GATE)
                v = jnp.where(ok, lv + sc, NEG)
                vals, bps = put(vals, bps, s, v, la.astype(jnp.int32),
                                j - eop)

            # ---- exon conv states ------------------------------------
            for ei, ecs in enumerate(tr.exon_conv):
                s = ecs.state
                phi = jnp.mod(ecs.phase_const + ecs.phase_sign * j, 3)
                smin = conv_smin[ei][j]
                smax = conv_smax[ei][j]

                def compute(j=j, ecs=ecs, ei=ei, phi=phi, smin=smin,
                            smax=smax, c=c):
                    best = NEG
                    bpred = jnp.int32(0)
                    boff = jnp.int32(1)
                    for vi, var in enumerate(ecs.variants):
                        width, _, fsel = self.static[ecs.state][vi]
                        lvd = conv_lenvec[(ecs.state, vi)]
                        b_lo = j + ecs.a_off - var.len_hi
                        G = pool_at_b(var.g_id, c, phi, b_lo, width)
                        H = pool_at_j(var.h_id, c, j)
                        eop_lo = b_lo - ecs.bpl - 1
                        if fsel is None:
                            L = jax.lax.dynamic_slice(
                                lanes, (eop_lo + PAD, ecs.lane),
                                (width, 1))[:, 0]
                            A = jax.lax.dynamic_slice(
                                lane_arg, (eop_lo + PAD, ecs.lane),
                                (width, 1))[:, 0]
                        else:
                            L3 = jax.lax.dynamic_slice(
                                lanes, (eop_lo + PAD, ecs.lane), (width, 3))
                            A3 = jax.lax.dynamic_slice(
                                lane_arg, (eop_lo + PAD, ecs.lane),
                                (width, 3))
                            onehot = jnp.asarray(
                                np.eye(3, dtype=np.bool_)[fsel])  # (w,3)
                            L = jnp.where(onehot, L3, NEG).max(axis=1)
                            A = jnp.where(
                                onehot, A3, 0).sum(axis=1).astype(jnp.int8)
                        widx = jax.lax.iota(jnp.int32, width)
                        b = b_lo + widx
                        okb = (b >= smin) & (b <= smax)
                        score = jnp.where(okb & (L > GATE) & (G > GATE),
                                          L + G + lvd, NEG)
                        ridx = width - 1 - jnp.argmax(score[::-1])
                        vbest = score[ridx] + H
                        vbest = jnp.where((score[ridx] > GATE) & (H > GATE),
                                          vbest, NEG)
                        take = vbest > best   # strict: earlier variant wins
                        best = jnp.where(take, vbest, best)
                        bpred = jnp.where(take, A[ridx].astype(jnp.int32),
                                          bpred)
                        boff = jnp.where(take, j - (eop_lo + ridx), boff)
                    return best, bpred, boff

                gate = conv_gate[ei][j]
                v, pred, off = jax.lax.cond(
                    gate, compute,
                    lambda: (NEG, jnp.int32(0), jnp.int32(1)))
                vals, bps = put(vals, bps, s, v, pred, off)

            # ---- lanes update ----------------------------------------
            lane_cand = vals[None, :] + lane_trans          # (NL, S)
            lane_argj = jnp.argmax(lane_cand, axis=1).astype(jnp.int8)
            lane_valj = jnp.max(lane_cand, axis=1)
            lanes = jax.lax.dynamic_update_slice(
                lanes, lane_valj[None, :], (j + PAD, 0))
            lane_arg = jax.lax.dynamic_update_slice(
                lane_arg, lane_argj[None, :], (j + PAD, 0))

            return (vals, lanes, lane_arg), bps

        # padded per-lessD validity tracks (host-built, closed over)
        _lessd_pad = []
        for ls in tr.lessd:
            _lessd_pad.append(dict(
                b_valid=jnp.asarray(np.concatenate(
                    [np.zeros(PAD, np.int8),
                     ls.b_valid.astype(np.int8)])),
                b_stop=jnp.asarray(np.concatenate(
                    [np.zeros(PAD, np.int8), ls.b_stopflag])),
            ))

        def run(v0):
            lanes0 = jnp.full((n + PAD + END_PAD, NL), NEG, dtype=jnp.float32)
            lane_arg0 = jnp.zeros((n + PAD + END_PAD, NL), dtype=jnp.int8)
            lane_cand = v0[None, :] + lane_trans
            l0 = jnp.max(lane_cand, axis=1)
            a0 = jnp.argmax(lane_cand, axis=1).astype(jnp.int8)
            # rows [0, PAD] replicate the initial column (eop<=0 clamp)
            lanes0 = lanes0.at[: PAD + 1, :].set(l0[None, :])
            lane_arg0 = lane_arg0.at[: PAD + 1, :].set(a0[None, :])
            (vfin, _, _), bps = jax.lax.scan(
                step, (v0, lanes0, lane_arg0), jnp.arange(1, n))
            return vfin, bps

        return run

    # ------------------------------------------------------------------
    def run(self) -> None:
        tr = self.tracks
        v0 = jnp.asarray(tr.log_init)
        vfin, bps = self._scan(v0)
        self.v_final = np.asarray(vfin)
        self.backptr = np.asarray(bps)      # (n-1, S) packed

    def traceback(self) -> List[Tuple[int, int, ST]]:
        tr = self.tracks
        n, S = self.n, self.S
        last = self.v_final + np.asarray(tr.log_term)
        state = int(np.argmax(last))
        if last[state] <= float(F32_NEG) / 2:
            raise RuntimeError("No feasible path found in HMM (scan)")
        segs: List[Tuple[int, int, ST]] = []
        base = n - 1
        types = tr.gold.sg.state_types
        while base > 0:
            packed = int(self.backptr[base - 1, state])
            pred = packed >> 20
            off = packed & 0xFFFFF
            pb = base - off
            segs.append((pb + 1, base, types[state]))
            base, state = pb, pred
        segs.reverse()
        return segs
