"""Dev diagnostic: host prep-stage times + H2D payload composition.

Runs prepare/build_tracks/pack_tracks on the bench input (host-only) and
prints per-stage seconds plus the byte size of every array pack_tracks
would ship to the device.  No TPU needed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench
from augustus_tpu.predict import Model
from augustus_tpu.engine.gold import GoldEngine
from augustus_tpu.io.fasta import read_fasta
from augustus_tpu import genetics

N = int(os.environ.get("PROF_N", 200000))


def main():
    fa, gff, n, nhints = bench._subset_inputs(N)
    model = Model.load({
        "species": "human", "AUGUSTUS_CONFIG_PATH": bench.CONFIG,
        "UTR": "off", "softmasking": "1",
        "hintsfile": gff,
        "extrinsicCfgFile": os.path.join(
            bench.CONFIG, "extrinsic", "extrinsic.M.RM.E.W.cfg")})
    rec = read_fasta(fa)[0]
    codes = genetics.encode(rec.sequence.upper())
    softmask = np.frombuffer(rec.sequence.encode(), dtype=np.uint8) >= ord('a')
    gff_hints = model.gff_hints.get(rec.name, []) \
        if model.gff_hints is not None else None

    gold = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                      model.decomp, model.gcode, utr=model.utr,
                      utr_cfg=model.utr_cfg, ext_cfg=model.ext_cfg)
    t0 = time.time()
    gold.prepare(codes, softmask=softmask, gff_hints=gff_hints)
    print(f"prepare: {time.time()-t0:.2f}s")

    from augustus_tpu.engine.device import build_tracks, pad_tracks, \
        bucket_length
    t0 = time.time()
    tracks = build_tracks(gold)
    print(f"build_tracks: {time.time()-t0:.2f}s")

    t0 = time.time()
    pad_tracks(tracks, bucket_length(tracks.n))
    print(f"pad: {time.time()-t0:.2f}s")

    from augustus_tpu.engine.pallas_pack import pack_tracks
    t0 = time.time()
    static, arrays = pack_tracks(tracks)
    print(f"pack_tracks(incl split): {time.time()-t0:.2f}s")

    total = 0
    rows = []
    for k, v in arrays.items():
        v = np.asarray(v)
        rows.append((v.nbytes, k, v.shape, str(v.dtype)))
        total += v.nbytes
    rows.sort(reverse=True)
    for nb, k, shp, dt in rows[:25]:
        print(f"{nb/1e6:10.2f} MB  {k:12s} {shp} {dt}")
    print(f"TOTAL: {total/1e6:.1f} MB for n={n} ({total/n:.0f} B/base)")
    print(f"static: S={static.S} NL={static.NL} C={static.C} NGR={static.NGR}"
          f" NMS={static.NMS} NHW={static.NHW} PHW={static.PHW}"
          f" nconvs={len(static.convs)} LVP={static.LVP}")
    nv = sum(len(c.variants) for c in static.convs)
    print(f"variants total={nv}")


if __name__ == "__main__":
    main()
