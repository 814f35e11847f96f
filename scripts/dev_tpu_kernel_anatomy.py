"""TPU diagnostic: which kernel category costs what.

Times the Pallas DP at N with categories of per-step work stripped from
the PKStatic (outputs are wrong; timing is the point).
"""
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import bench
from augustus_tpu.predict import Model
from augustus_tpu.engine.gold import GoldEngine
from augustus_tpu.engine.device import build_tracks
from augustus_tpu.engine.pallas_pack import pack_tracks
from augustus_tpu.engine.pallas_scan import make_pallas_fn
from augustus_tpu.io.fasta import read_fasta
from augustus_tpu import genetics

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200000


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
    sm = np.frombuffer(rec.sequence.encode(), dtype=np.uint8) >= ord('a')
    ghl = model.gff_hints.get(rec.name, [])
    gold = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                      model.decomp, model.gcode, ext_cfg=model.ext_cfg)
    gold.set_boundaries(False, False)
    gold.prepare(codes, softmask=sm, gff_hints=ghl)
    tracks = build_tracks(gold)
    static, arrays = pack_tracks(tracks)
    nm = 1 + len(static.fixed_groups)
    cmask = np.zeros((nm, 64), dtype=np.int32)
    for s in static.chain_states:
        cmask[0, s] = 1
    for gi, g in enumerate(static.fixed_groups):
        for s in g.states:
            cmask[gi + 1, s] = 1
    arrays["cmask"] = cmask
    dev = {k: jnp.asarray(v) for k, v in arrays.items()}

    variants = {
        "full": static,
        "no-convs": replace(static, convs=()),
        "no-lessd": replace(static, lessd=()),
        "no-fixed": replace(static, fixed_groups=()),
        "no-pinned": replace(static, pinned=()),
        "convs-only-big": replace(static, convs=tuple(
            replace(c, variants=tuple(v for v in c.variants
                                      if v.width > 256))
            for c in static.convs)),
        "convs-only-small": replace(static, convs=tuple(
            replace(c, variants=tuple(v for v in c.variants
                                      if v.width <= 256))
            for c in static.convs)),
        "bare": replace(static, convs=(), lessd=(), fixed_groups=(),
                        pinned=()),
    }
    for name, st in variants.items():
        fn = make_pallas_fn(st)
        try:
            out = fn(dev)
            v = np.asarray(out[1])
            t0 = time.time()
            for _ in range(2):
                out = fn(dev)
                v = np.asarray(out[1])
            dt = (time.time() - t0) / 2
            print(f"{name:18s} {dt:6.2f}s  ({dt/n*1e6:.2f} us/step)")
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
