"""Measure host-side prep cost scaling: GoldEngine.prepare + build_tracks
+ split_tracks per sequence length (the non-DP part of the device path)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    from augustus_tpu import genetics
    from augustus_tpu.predict import Model
    from augustus_tpu.engine.gold import GoldEngine
    from augustus_tpu.engine.device import build_tracks
    from augustus_tpu.engine.scan import split_tracks
    from augustus_tpu.io.fasta import read_fasta

    model = Model.load({"species": "human",
                        "AUGUSTUS_CONFIG_PATH": "/root/reference/config",
                        "UTR": "off", "softmasking": "0"})
    genome = read_fasta("/root/reference/examples/autoAug/genome.fa")[0] \
        .sequence.lower()
    for n in (10000, 50000, 200000):
        seq = genome[:n]
        codes = genetics.encode(seq)
        t0 = time.time()
        eng = GoldEngine(model.sg, model.cn, model.igp, model.exp,
                         model.inp, model.decomp, model.gcode)
        eng.prepare(codes)
        t1 = time.time()
        tracks = build_tracks(eng)
        t2 = time.time()
        static, arrays = split_tracks(tracks)
        t3 = time.time()
        nb = sum(a.nbytes for a in arrays.values()
                 if hasattr(a, "nbytes"))
        print(f"n={n:7d} prepare={t1-t0:6.2f}s build={t2-t1:6.2f}s "
              f"split={t3-t2:6.2f}s total={t3-t0:6.2f}s "
              f"({(t3-t0)/n*1e6:6.1f} us/base) arrays={nb/1e6:.0f}MB",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
