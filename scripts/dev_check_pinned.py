"""Dev check: new vectorized _build_pinned vs the gold-engine oracle
(_not_end_part at the single begin candidate), on a hinted region of chrI
that contains exonpart/exon hints (sparse machinery active)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench
from augustus_tpu.predict import Model
from augustus_tpu.engine.gold import GoldEngine, NEG_INF
from augustus_tpu.io.fasta import read_fasta
from augustus_tpu import genetics
from augustus_tpu.engine import tracks as T
from augustus_tpu.engine.device import _build_pinned
from augustus_tpu.model.state_config import ST
from augustus_tpu.constants import ASS_MIDDLE


def old_pinned_scores(eng, t):
    """Replica of the pre-round-5 _build_pinned (gold _not_end_part calls)."""
    cn, n = eng.cn, eng.n
    g = eng.geom[t]
    C = len(eng.inp.gc)
    j = np.arange(n)
    if t == ST.rsingleG:
        ends = [np.asarray(eng.tis_end_rev[c]) for c in range(C)]
    else:
        asspos = j + cn.ass_end + 1
        gate = (j == n - 1) | ((j + cn.ass_end + ASS_MIDDLE < n) &
                               T.is_possible_rass(eng.splice.rass_ok, asspos))
        end = np.where(gate, 0.0, NEG_INF)
        if getattr(eng, "hints", None) is not None:
            ok = (asspos >= 0) & (asspos < n)
            padj = np.where(ok, eng.ass_site_adj_m[np.clip(asspos, 0, n - 1)],
                            eng.log_malus["ass"])
            end = np.where(end > NEG_INF, end + padj, end)
        ends = [end for _ in range(C)]
    end_any = np.maximum.reduce(ends) > NEG_INF
    feas = np.flatnonzero(end_any)
    eop_arr = np.full(n, -1, dtype=np.int32)
    score = np.full((C, n), NEG_INF)
    if feas.size:
        end_of_bio = feas + g.base_offset
        right = end_of_bio - g.inner_part_end_offset
        frame_of_right = int((g.win + g.inner_part_end_offset + 1) % 3)
        eon = np.minimum(end_of_bio, n - 1)
        f_eon = (g.win + 1 + end_of_bio - eon) % 3
        orf_left = np.asarray(T.leftmost_exon_begin(
            eng.orf, f_eon, eon, False, cn, n), dtype=np.int64)
        b = orf_left + 2
        eop = b - g.begin_part_len - 1
        keep = (right >= 0) & (eop < n)
        feas, b, right, eop = feas[keep], b[keep], right[keep], eop[keep]
        CHK = 2048
        for o in range(0, feas.shape[0], CHK):
            fj = feas[o: o + CHK]
            bk = b[o: o + CHK]
            rk = right[o: o + CHK]
            for c in range(C):
                sel = ends[c][fj] > NEG_INF
                if not sel.any():
                    continue
                vals = eng._not_end_part(t, c, g, bk[sel], rk[sel],
                                         frame_of_right)
                score[c, fj[sel]] = np.where(
                    vals > NEG_INF, vals + ends[c][fj[sel]], NEG_INF)
        ok = (score[:, feas] > NEG_INF).any(axis=0)
        eop_arr[feas[ok]] = eop[ok]
    return eop_arr, score


def main():
    model = Model.load({
        "species": "human", "AUGUSTUS_CONFIG_PATH": bench.CONFIG,
        "UTR": "off", "softmasking": "1",
        "hintsfile": bench.HINTS,
        "extrinsicCfgFile": os.path.join(
            bench.CONFIG, "extrinsic", "extrinsic.M.RM.E.W.cfg")})
    seq = read_fasta(bench.GENOME)[0].sequence
    for lo, hi, tag in ((600000, 680000, "with-exon-hints"),
                       (0, 60000, "softmask-only")):
        sub = seq[lo:hi]
        codes = genetics.encode(sub.upper())
        sm = np.frombuffer(sub.encode(), dtype=np.uint8) >= ord('a')
        gh = [f.shifted(-lo) if hasattr(f, "shifted") else f
              for f in model.gff_hints.get("chrI", [])]
        # shift hints into local coords
        import copy
        ghl = []
        for f in model.gff_hints.get("chrI", []):
            if f.start >= lo and f.end < hi:
                f2 = copy.copy(f)
                f2.start -= lo
                f2.end -= lo
                ghl.append(f2)
        if tag == "with-exon-hints":
            # synthetic exon-kind hints (bonus != 1) to exercise the
            # sparse quotient machinery in the pinned builder
            from augustus_tpu.hints.features import Feature
            rng = np.random.RandomState(7)
            for i in range(120):
                a = int(rng.randint(0, hi - lo - 400))
                ln = int(rng.randint(30, 380))
                tpe = ["exonpart", "CDSpart", "exon", "CDS"][i % 4]
                st_ = "+-."[i % 3]
                ghl.append(Feature(start=a, end=a + ln, type=tpe, strand=st_,
                                   source="M", bonus=float(rng.uniform(1.5, 8.0)),
                                   malus=0.9))
        eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                         model.decomp, model.gcode, ext_cfg=model.ext_cfg)
        eng.prepare(codes, softmask=sm, gff_hints=ghl)
        eng._device_sparse_hints = any(
            eng.hints.by_type[t] for t in
            ("exonpart", "CDSpart", "exon", "CDS")) if eng.hints else False
        nh = sum(len(eng.hints.by_type[t]) for t in
                 ("exonpart", "CDSpart", "exon", "CDS")) if eng.hints else 0
        print(f"--- region {tag} [{lo},{hi}) exon-kind hints={nh} "
              f"sparse={getattr(eng,'_device_sparse_hints',False)}")
        for t in (ST.rsingleG, ST.rterminal0, ST.rterminal1, ST.rterminal2):
            eo, so = old_pinned_scores(eng, t)
            ps = _build_pinned(eng, 0, t, 0, 3136)
            en_, sn = np.asarray(ps.eop), np.asarray(ps.score)
            so32 = np.maximum(np.nan_to_num(so, neginf=-1e30), -1e30)
            mism_e = int((eo != en_).sum())
            fin = so32 > -1e29
            finn = sn > -1e29
            supp = int((fin != finn).sum())
            d = np.abs(np.where(fin & finn, so32 - sn, 0.0))
            print(f"{t!r}: eop mism={mism_e} support mism={supp} "
                  f"max|d|={d.max():.3e}")
            assert mism_e == 0 and supp == 0 and d.max() < 1e-6, t


if __name__ == "__main__":
    main()
