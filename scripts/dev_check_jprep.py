"""Dev check: fused device-prep arrays vs host pack_tracks arrays.

Runs the traced JGold+build+pack pipeline under jit on CPU at small n and
compares every packed array against the host pipeline (f64) output.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import numpy as np

import bench
from augustus_tpu.predict import Model
from augustus_tpu.engine.gold import GoldEngine
from augustus_tpu.io.fasta import read_fasta
from augustus_tpu import genetics
from augustus_tpu.model import gc as gcmod
from augustus_tpu.engine import xputil as U
from augustus_tpu.engine.jgold import JGold, build_overlays
from augustus_tpu.engine.device import build_tracks
from augustus_tpu.engine.pallas_pack import pack_tracks, compute_cls_blk

N = int(os.environ.get("PROF_N", 12000))
OFF = int(os.environ.get("PROF_OFF", 0))
HINTS = os.environ.get("PROF_HINTS", "1") == "1"


def main():
    model = Model.load({
        "species": "human", "AUGUSTUS_CONFIG_PATH": bench.CONFIG,
        "UTR": "off", "softmasking": "1" if HINTS else "0",
        **({"hintsfile": bench.HINTS,
            "extrinsicCfgFile": os.path.join(
                bench.CONFIG, "extrinsic", "extrinsic.M.RM.E.W.cfg")}
           if HINTS else {})})
    seq = read_fasta(bench.GENOME)[0].sequence[OFF:OFF + N]
    codes = genetics.encode(seq.upper())
    sm = np.frombuffer(seq.encode(), dtype=np.uint8) >= ord('a')
    import copy
    ghl = []
    if HINTS:
        for f in model.gff_hints.get("chrI", []):
            if f.start >= OFF and f.end < OFF + N:
                f2 = copy.copy(f)
                f2.start -= OFF
                f2.end -= OFF
                ghl.append(f2)
    n = codes.shape[0]

    # ---- host pipeline -------------------------------------------------
    gold = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                      model.decomp, model.gcode, ext_cfg=model.ext_cfg)
    gold.set_boundaries(False, False)
    gold.prepare(codes, softmask=sm if HINTS else None,
                 gff_hints=ghl if HINTS else None)
    htracks = build_tracks(gold)
    hstat, harr = pack_tracks(htracks)

    # ---- device (traced) pipeline --------------------------------------
    jg = JGold(model.sg, model.cn, model.igp, model.exp, model.inp,
               model.decomp, model.gcode, ext_cfg=model.ext_cfg)
    jg.set_boundaries(False, False)
    meta, ov = build_overlays(gold.hints, n)
    assert not meta.sparse_exon
    stairs = gcmod.compute_stairs(codes, model.cn, model.decomp)
    cls_blk = compute_cls_blk(stairs, n)
    cell = {}

    def fullrun(codes_d, stairs_d, ovd, cb):
        with U.use_jax():
            jg.device_prepare(codes_d, stairs_d, meta, ovd)
            tracks = build_tracks(jg)
            static, arrays = pack_tracks(tracks, cls_blk=cb)
        cell["static"] = static
        return arrays

    t0 = time.time()
    fn = jax.jit(fullrun)
    darr = fn(jnp.asarray(codes.astype(np.int32)),
              jnp.asarray(stairs.astype(np.int32)),
              {k: jnp.asarray(v) for k, v in ov.items()},
              jnp.asarray(cls_blk))
    darr = jax.tree_util.tree_map(np.asarray, darr)
    print(f"traced+compiled+ran in {time.time()-t0:.1f}s")

    dstat = cell["static"]
    # static comparison (n-independent fields)
    for f in ("S", "NL", "C", "NGR", "NMS", "NSEL", "LVP", "chain_states",
              "fixed_groups", "lessd", "pinned", "convs", "gate_lane",
              "cls_lane", "NHW"):
        hv, dv = getattr(hstat, f), getattr(dstat, f)
        if hv != dv:
            print(f"STATIC MISMATCH {f}:\n  host {hv}\n  dev  {dv}")
    print(f"static match checked; PHW host={hstat.PHW} dev={dstat.PHW}")

    worst = []
    for k in sorted(harr):
        h = np.asarray(harr[k])
        d = darr.get(k)
        if d is None:
            print(f"missing device array {k}")
            continue
        if h.shape != d.shape:
            print(f"SHAPE {k}: host {h.shape} dev {d.shape}")
            continue
        if h.size == 0:
            continue
        if h.dtype.kind in "iu" or d.dtype.kind in "iu" or h.dtype == bool:
            mism = int((h != d).sum())
            if mism:
                idx = np.argwhere(h != d)[:5]
                print(f"INT MISMATCH {k}: {mism} cells, first {idx.tolist()}"
                      f" host={h[tuple(idx[0])]} dev={d[tuple(idx[0])]}")
            continue
        hf = np.maximum(np.nan_to_num(h, neginf=-1e30), -1e30)
        df = np.maximum(np.nan_to_num(d, neginf=-1e30), -1e30)
        live_h = hf > -1e29
        live_d = df > -1e29
        supp = int((live_h != live_d).sum())
        diff = np.abs(np.where(live_h & live_d, hf - df, 0.0))
        rel = diff / np.maximum(1.0, np.abs(np.where(live_h, hf, 0.0)))
        worst.append((float(rel.max()), float(diff.max()), supp, k))
    worst.sort(reverse=True)
    bad = 0
    for relmax, dmax, supp, k in worst:
        flag = ""
        if supp or relmax > 3e-6:
            flag = "  <-- CHECK"
            bad += 1
        print(f"{k:14s} supp={supp:6d} max|d|={dmax:10.4g} "
              f"maxrel={relmax:10.3g}{flag}")
    print("BAD" if bad else "OK")


if __name__ == "__main__":
    main()
