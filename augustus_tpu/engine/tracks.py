"""Per-sequence dense log-score tracks.

This is the core TPU-first re-architecture: instead of evaluating emission
probabilities lazily per DP candidate (reference: ExonModel::seqProb
src/exonmodel.cc:1925, SnippetProbs/SegProbs include/statemodel.hh:182-256),
we precompute for the whole sequence

  * per-base content log-emissions for every model / strand / frame-phase,
    plus their prefix sums -> any segment emission is O(1),
  * windowed signal-sensor scores (donor/acceptor splice sites, translation
    initiation, stop codons) as dense tracks,
  * open-reading-frame stop barriers (nearest in-frame stop per frame/strand).

Everything is float64 log space on the host; the TPU engine consumes the same
tracks as float32 device arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from .. import genetics
from ..constants import Constants, ASS_MIDDLE, DSS_MIDDLE, STARTCODON_LEN, STOPCODON_LEN
from ..model.pbl import (ExonParams, IgenicParams, IntronParams, Motif,
                         BinnedProbs)

NEG_INF = float("-inf")
LOG_QUARTER = float(np.log(0.25))


def _safe_log(x: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore"):
        return np.log(x)


def kmer_lookup_log(codes: np.ndarray, k1: int, table: np.ndarray,
                    invalid_log: float) -> np.ndarray:
    """log table[pattern ending at j] for j in [k1-1, n-1]; positions j<k1-1
    and windows containing N get `invalid_log`.  Returns full length n."""
    n = codes.shape[0]
    out = np.full(n, invalid_log)
    ids = genetics.kmer_ids(codes, k1)          # pattern starting at i
    if ids.shape[0] == 0:
        return out
    valid = ids >= 0
    logs = np.where(valid, _safe_log(table[np.where(valid, ids, 0)]),
                    invalid_log)
    out[k1 - 1:] = logs                          # ends at j = i + k1 - 1
    return out


def rc_kmer_lookup_log(codes: np.ndarray, k1: int, table: np.ndarray,
                       invalid_log: float) -> np.ndarray:
    """log table[rc pattern starting at j] for j in [0, n-k1]; tail positions
    (window crossing the end) and N windows get `invalid_log`."""
    n = codes.shape[0]
    out = np.full(n, invalid_log)
    ids = genetics.rc_kmer_ids(codes, k1)
    if ids.shape[0] == 0:
        return out
    valid = ids >= 0
    out[: n - k1 + 1] = np.where(valid, _safe_log(table[np.where(valid, ids, 0)]),
                                 invalid_log)
    return out


def phase_cumsum(per_frame: np.ndarray, reverse: bool) -> np.ndarray:
    """Build prefix sums for the 3 frame phases.

    per_frame: (3, n) log emission of position j if its frame were f.
    Returns cum: (3, n+1) with cum[phi, j+1] = sum_{i<=j} per_frame[frame(phi,i), i]
    where frame(phi,i) = (phi+i)%3 forward, (phi-i)%3 reverse.
    """
    _, n = per_frame.shape
    pos = np.arange(n)
    cum = np.zeros((3, n + 1))
    for phi in range(3):
        f = (phi + pos) % 3 if not reverse else (phi - pos) % 3
        sel = per_frame[f, pos]
        cum[phi, 1:] = np.cumsum(sel)
    return cum


def seg_sum(cum: np.ndarray, phi, left, right):
    """Sum of track values over [left, right] (inclusive); 0 if left>right."""
    left = np.asarray(left)
    right = np.asarray(right)
    return np.where(left > right, 0.0, cum[phi, right + 1] - cum[phi, left])


def motif_score_fwd(codes: np.ndarray, motif: Motif) -> np.ndarray:
    """log Motif::seqProb(seq + s) for every window start s (forward,
    non-complement): product over window positions i of
    windowProbs[i][pattern ending at s+i spanning [s+i-k, s+i]].
    Window positions whose pattern contains N or crosses the sequence end
    contribute 0.25 (reference Motif::seqProb per-position catch).
    Defined for s in [k, n-1]; s < k gets -inf (callers gate on that)."""
    n = codes.shape[0]
    k1 = motif.k + 1
    out = np.full(n, NEG_INF)
    if n <= motif.k:
        return out
    ids_part = genetics.kmer_ids(codes, k1)     # start i -> [i, i+k]
    ids = np.full(n, -1, dtype=np.int64)
    ids[: ids_part.shape[0]] = ids_part         # starts beyond n-k1: invalid
    logw = _safe_log(motif.window_probs)        # (n_win, 4^{k+1})
    starts = np.arange(motif.k, n)
    acc = np.zeros(starts.shape[0])
    for i in range(motif.n):
        pat_start = np.clip(starts + i - motif.k, 0, n - 1)
        in_range = (starts + i - motif.k) <= n - 1
        pid = ids[pat_start]
        v = in_range & (pid >= 0)
        acc += np.where(v, logw[i, np.where(v, pid, 0)], LOG_QUARTER)
    out[motif.k:] = acc
    return out


def motif_score_rc(codes: np.ndarray, motif: Motif) -> np.ndarray:
    """log Motif::seqProb(seq + s, reverse=True, complement=True) per start s:
    product over i of windowProbs[n-1-i][rc pattern starting at s+i]; window
    positions crossing the end or containing N contribute 0.25."""
    n = codes.shape[0]
    k1 = motif.k + 1
    out = np.full(n, NEG_INF)
    if n == 0:
        return out
    ids_part = genetics.rc_kmer_ids(codes, k1)  # start i -> rc of [i, i+k]
    ids = np.full(n, -1, dtype=np.int64)
    ids[: ids_part.shape[0]] = ids_part
    logw = _safe_log(motif.window_probs)
    starts = np.arange(0, n)
    acc = np.zeros(starts.shape[0])
    for i in range(motif.n):
        pat_start = np.clip(starts + i, 0, n - 1)
        in_range = (starts + i) <= n - 1
        pid = ids[pat_start]
        v = in_range & (pid >= 0)
        acc += np.where(v, logw[motif.n - 1 - i, np.where(v, pid, 0)],
                        LOG_QUARTER)
    out[:] = acc
    out[: 0] = NEG_INF
    return out


@dataclass
class SpliceTracks:
    dss_ok: np.ndarray          # "gt" (or "gc") starting at pos
    rdss_ok: np.ndarray         # "ac" starting at pos
    ass_ok: np.ndarray          # "ag" starting at pos
    rass_ok: np.ndarray         # "ct" starting at pos
    dss_score: np.ndarray       # log dSSProb(base, fwd)
    rdss_score: np.ndarray      # log dSSProb(base, rev)
    ass_score: List[np.ndarray]   # per GC class: log aSSProb(base, fwd)
    rass_score: List[np.ndarray]  # per GC class: log aSSProb(base, rev)


def dinuc_at(codes: np.ndarray, a: int, b: int) -> np.ndarray:
    n = codes.shape[0]
    out = np.zeros(n, dtype=bool)
    out[: n - 1] = (codes[:-1] == a) & (codes[1:] == b)
    return out


def is_possible_dss(dss_ok: np.ndarray, pos) -> np.ndarray:
    """reference StateModel::isPossibleDSS: 1 <= pos <= n-2 and consensus
    'gt' at [pos, pos+1] (hints add sites later)."""
    n = dss_ok.shape[0]
    pos = np.asarray(pos)
    ok = (pos >= 1) & (pos <= n - 2)
    return ok & dss_ok[np.clip(pos, 0, n - 1)]


def is_possible_rdss(rdss_ok: np.ndarray, pos) -> np.ndarray:
    """'ac' at [pos-1, pos]."""
    n = rdss_ok.shape[0]
    pos = np.asarray(pos)
    ok = (pos >= 1) & (pos <= n - 2)
    return ok & rdss_ok[np.clip(pos - 1, 0, n - 1)]


def is_possible_ass(ass_ok: np.ndarray, pos) -> np.ndarray:
    """'ag' at [pos-1, pos]."""
    n = ass_ok.shape[0]
    pos = np.asarray(pos)
    ok = (pos >= 1) & (pos <= n - 2)
    return ok & ass_ok[np.clip(pos - 1, 0, n - 1)]


def is_possible_rass(rass_ok: np.ndarray, pos) -> np.ndarray:
    """'ct' at [pos, pos+1]."""
    n = rass_ok.shape[0]
    pos = np.asarray(pos)
    ok = (pos >= 1) & (pos <= n - 2)
    return ok & rass_ok[np.clip(pos, 0, n - 1)]


def build_splice_tracks(codes: np.ndarray, ip: IntronParams, cn: Constants,
                        hinted=None) -> SpliceTracks:
    """hinted: optional (fD, rD, fA, rA) boolean arrays of hint-enabled
    splice sites (reference isPossibleDSS merges genomic consensus with
    hinted sites, include/statemodel.hh:98-117)."""
    n = codes.shape[0]
    A, C, G, T = genetics.A, genetics.C, genetics.G, genetics.T

    dss_ok = dinuc_at(codes, G, T)
    if cn.dss_gc_allowed:
        dss_ok |= dinuc_at(codes, G, C)
    rdss_ok = dinuc_at(codes, A, C)
    if cn.dss_gc_allowed:
        rdss_ok |= dinuc_at(codes, G, C)
    ass_ok = dinuc_at(codes, A, G)
    rass_ok = dinuc_at(codes, C, T)
    if hinted is not None:
        fD, rD, fA, rA = hinted
        dss_ok = dss_ok | fD                       # 'gt'-indexed at pos
        rdss_ok = rdss_ok | np.roll(rD, -1)        # pattern at pos-1
        ass_ok = ass_ok | np.roll(fA, -1)
        rass_ok = rass_ok | rA

    # ---- donor (DSS) windowed pattern score --------------------------------
    # forward window starting at base: [base, base+dss_start-1] then the GT at
    # [base+dss_start, +1], then [base+dss_start+2, base+dss_whole-1]
    # pattern = outer bases (dss_size of them); prob from dssprobs, binned.
    ds, de = cn.dss_start, cn.dss_end
    dsize = cn.dss_size
    dss_score = np.full(n, NEG_INF)
    rdss_score = np.full(n, NEG_INF)

    # build pattern ids vectorized: big-endian over the dsize pattern chars
    def window_ids(offsets: List[np.ndarray]) -> np.ndarray:
        ids = np.zeros(offsets[0].shape[0], dtype=np.int64)
        bad = np.zeros(offsets[0].shape[0], dtype=bool)
        for off in offsets:
            c = codes[off].astype(np.int64)
            bad |= c == genetics.N
            ids = (ids << 2) | np.where(c == genetics.N, 0, c)
        return np.where(bad, -1, ids)

    def rc_ids(offsets: List[np.ndarray]) -> np.ndarray:
        # complement bases, given in already-reversed offset order
        ids = np.zeros(offsets[0].shape[0], dtype=np.int64)
        bad = np.zeros(offsets[0].shape[0], dtype=bool)
        for off in offsets:
            c = genetics.COMPLEMENT[codes[off]].astype(np.int64)
            bad |= c == genetics.N
            ids = (ids << 2) | np.where(c == genetics.N, 0, c)
        return np.where(bad, -1, ids)

    # forward DSS: possible at base if isPossibleDSS(base+dss_start) and the
    # whole window [base, base+dss_whole-1] is inside the sequence
    base = np.arange(n)
    whole = cn.dss_whole_size
    okb = (base + whole <= n) & is_possible_dss(dss_ok, base + ds)
    sel = base[okb]
    if sel.size:
        offs = [sel + i for i in range(ds)] + \
               [sel + ds + DSS_MIDDLE + i for i in range(de)]
        pid = window_ids(offs)
        valid = pid >= 0
        probs = np.where(valid, ip.dss_probs[np.where(valid, pid, 0)], 0.0)
        # non-GT consensus (gc) sites get an extra factor
        non_gt = ~dinuc_at(codes, G, T)[np.clip(sel + ds, 0, n - 1)]
        probs = np.where(non_gt, probs * ip.non_gt_dss_prob, probs)
        if ip.dss_bin.nbins > 0:
            probs = np.where(valid & (probs >= 0), ip.dss_bin.factor(probs), probs)
        dss_score[sel] = np.where(valid, _safe_log(probs), NEG_INF)

    # reverse DSS window starting at base: [base, base+dss_end-1], "ac" at
    # [base+dss_end, +1], [base+dss_end+2, base+dss_whole-1]; the pattern is
    # the reverse complement read: first the rc of the right part then rc of
    # the left part (reference dSSProb, reverse branch).
    okb = (base + whole <= n) & is_possible_rdss(rdss_ok, base + de + 1)
    sel = base[okb]
    if sel.size:
        # putReverseComplement(astr, seq + dsspos + DSS_MIDDLE, dss_start):
        # astr[0:ds] = rc of seq[base+de+2 : base+de+2+ds]
        # astr[ds:ds+de] = rc of seq[base : base+de]
        offs = [sel + de + DSS_MIDDLE + ds - 1 - i for i in range(ds)] + \
               [sel + de - 1 - i for i in range(de)]
        pid = rc_ids(offs)
        valid = pid >= 0
        probs = np.where(valid, ip.dss_probs[np.where(valid, pid, 0)], 0.0)
        non_gt = ~dinuc_at(codes, A, C)[np.clip(sel + de, 0, n - 1)]
        probs = np.where(non_gt, probs * ip.non_gt_dss_prob, probs)
        if ip.dss_bin.nbins > 0:
            probs = np.where(valid, ip.dss_bin.factor(probs), probs)
        rdss_score[sel] = np.where(valid, _safe_log(probs), NEG_INF)

    # ---- acceptor (ASS) ----------------------------------------------------
    asz, ae = cn.ass_start, cn.ass_end
    up = cn.ass_upwindow_size
    ass_whole = cn.ass_whole_size
    ass_score: List[np.ndarray] = []
    rass_score: List[np.ndarray] = []
    for gcp in ip.gc:
        fwd = np.full(n, NEG_INF)
        rev = np.full(n, NEG_INF)
        motif_f = motif_score_fwd(codes, gcp.ass_motif)
        motif_r = motif_score_rc(codes, gcp.ass_motif)

        # forward: window [base, base+up+ass_whole-1]; "ag" at
        # [base+up+ass_start, +1]; pattern = [base+up, +ass_start-1] +
        # [base+up+ass_start+2, ...+ae-1]; motif over [base, base+up-1]
        okb = (base + up + ass_whole <= n) & \
            is_possible_ass(ass_ok, base + up + asz + 1)
        sel = base[okb]
        if sel.size:
            offs = [sel + up + i for i in range(asz)] + \
                   [sel + up + asz + ASS_MIDDLE + i for i in range(ae)]
            pid = window_ids(offs)
            valid = pid >= 0
            pat = np.where(valid, ip.ass_probs[np.where(valid, pid, 0)], 0.0)
            non_ag = ~dinuc_at(codes, A, G)[np.clip(sel + up + asz, 0, n - 1)]
            pat = np.where(non_ag, pat * ip.non_ag_ass_prob, pat)
            if ip.ass_bin.nbins > 0:
                patb = np.where(valid, ip.ass_bin.factor(pat), pat)
            else:
                patb = pat
            lp = np.where(valid, _safe_log(patb),
                          np.log(0.001) + cn.ass_size * LOG_QUARTER)
            # motifProb = 0 when base < motif.k (reference aSSProb)
            mot = np.where(sel >= gcp.ass_motif.k, motif_f[sel], NEG_INF)
            fwd[sel] = lp + mot
        # reverse: "ct" at [base+ae, +1]; pattern rc; motif over
        # [base+ass_whole, +up-1] in rc orientation
        okb = (base + up + ass_whole <= n) & \
            is_possible_rass(rass_ok, base + ae)
        sel = base[okb]
        if sel.size:
            offs = [sel + ae + ASS_MIDDLE + asz - 1 - i for i in range(asz)] + \
                   [sel + ae - 1 - i for i in range(ae)]
            pid = rc_ids(offs)
            valid = pid >= 0
            pat = np.where(valid, ip.ass_probs[np.where(valid, pid, 0)], 0.0)
            non_ag = ~dinuc_at(codes, C, T)[np.clip(sel + ae, 0, n - 1)]
            pat = np.where(non_ag, pat * ip.non_ag_ass_prob, pat)
            if ip.ass_bin.nbins > 0:
                patb = np.where(valid, ip.ass_bin.factor(pat), pat)
            else:
                patb = pat
            lp = np.where(valid, _safe_log(patb),
                          np.log(0.001) + cn.ass_size * LOG_QUARTER)
            motifstart = sel + ass_whole
            motifend = motifstart + up
            mot = np.where(motifend + gcp.ass_motif.k < n,
                           motif_r[motifstart], up * LOG_QUARTER)
            rev[sel] = lp + mot
        ass_score.append(fwd)
        rass_score.append(rev)

    return SpliceTracks(dss_ok=dss_ok, rdss_ok=rdss_ok, ass_ok=ass_ok,
                        rass_ok=rass_ok, dss_score=dss_score,
                        rdss_score=rdss_score, ass_score=ass_score,
                        rass_score=rass_score)


def nearest_stop_arrays(codes: np.ndarray, code: genetics.GeneticCode
                        ) -> Dict[str, np.ndarray]:
    """reference OpenReadingFrame ctor (src/exonmodel.cc:167): per position i
    (stepping by 3 within each frame lane), the largest stop-codon start
    <= i in the same lane; -1 if none.  Plus the tail fixups."""
    n = codes.shape[0]
    fwd = np.full(n, -1, dtype=np.int64)
    rev = np.full(n, -1, dtype=np.int64)
    stops_f = code.stop_at(codes)
    stops_r = code.rc_stop_at(codes)
    limit = n - STOPCODON_LEN
    for lane in range(3):
        pos = np.arange(lane, limit + 1, 3)
        if pos.size == 0:
            continue
        for arr, stops in ((fwd, stops_f), (rev, stops_r)):
            hit = np.where(stops[pos], pos, -1)
            arr[pos] = np.maximum.accumulate(hit)
    if n > 5:
        fwd[limit + 1] = fwd[limit - 2]
        fwd[limit + 2] = fwd[limit - 1]
        rev[limit + 1] = rev[limit - 2]
        rev[limit + 2] = rev[limit - 1]
    return {"fwd": fwd, "rev": rev}


def leftmost_exon_begin(orf: Dict[str, np.ndarray], frame, base, forward: bool,
                        cn: Constants, n: int):
    """reference OpenReadingFrame::leftmostExonBegin (vectorized)."""
    frame = np.asarray(frame)
    base = np.asarray(base)
    if forward:
        pos = np.where((frame == 0) | (frame == 1), base - frame - 3,
                       base - frame)
    else:
        pos = np.where((frame == 1) | (frame == 2), base + frame - 5,
                       base - 2)
    pos = np.where(pos >= n, pos - 3 * ((pos - n + 3) // 3), pos)
    arr = orf["fwd"] if forward else orf["rev"]
    leftmost = np.where(pos >= 0, arr[np.clip(pos, 0, n - 1)] + 1, 0)
    max_allowed = (cn.max_exon_len - cn.ass_upwindow_size - cn.ass_start
                   - ASS_MIDDLE - DSS_MIDDLE - cn.dss_start)
    return np.maximum(leftmost, base - max_allowed)


def leftmost_exon_begin_raw(orf: Dict[str, np.ndarray], frame: int, base: int,
                            forward: bool, cn: Constants, n: int) -> int:
    """Scalar leftmostExonBegin accepting the RAW frame value the reference
    passes (may be -1 for win==0 internal exons: then pos = base+1)."""
    if forward:
        pos = base - frame - 3 if frame in (0, 1) else base - frame
    else:
        pos = base + frame - 5 if frame in (1, 2) else base - 2
    if pos >= n:
        pos -= 3 * ((pos - n + 3) // 3)
    arr = orf["fwd"] if forward else orf["rev"]
    leftmost = int(arr[pos]) + 1 if pos >= 0 else 0
    max_allowed = (cn.max_exon_len - cn.ass_upwindow_size - cn.ass_start
                   - ASS_MIDDLE - DSS_MIDDLE - cn.dss_start)
    return max(leftmost, base - max_allowed)
