"""TPU smoke: fused device-prep decode vs host-prep decode, GFF compare.

Usage: python scripts/dev_tpu_fused_smoke.py [N [OFF]]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import bench
from augustus_tpu.predict import Model, predict_file
from augustus_tpu import stats

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50000


def main():
    import jax
    print("devices:", jax.devices())
    fa, gff, n, nhints = bench._subset_inputs(N)
    model = Model.load({
        "species": "human", "AUGUSTUS_CONFIG_PATH": bench.CONFIG,
        "UTR": "off", "softmasking": "1",
        "hintsfile": gff,
        "extrinsicCfgFile": os.path.join(
            bench.CONFIG, "extrinsic", "extrinsic.M.RM.E.W.cfg")})

    stats.reset(True)
    t0 = time.time()
    out_fused = predict_file(model, fa, engine="auto")
    print(f"fused cold: {time.time()-t0:.1f}s; {stats.report()}")
    stats.reset(True)
    t0 = time.time()
    out_fused2 = predict_file(model, fa, engine="auto")
    print(f"fused warm: {time.time()-t0:.1f}s; {stats.report()}")
    assert out_fused == out_fused2

    stats.reset(True)
    t0 = time.time()
    out_scan = predict_file(model, fa, engine="scan")
    print(f"scan(host prep): {time.time()-t0:.1f}s")

    if out_fused == out_scan:
        print(f"IDENTICAL GFF output ({len(out_scan.splitlines())} lines)")
    else:
        import difflib
        diff = list(difflib.unified_diff(out_scan.splitlines(),
                                         out_fused.splitlines(), n=0))
        print(f"DIFFS: {sum(1 for l in diff if l.startswith(('+','-')))} "
              f"lines of {len(out_scan.splitlines())}")
        for l in diff[:40]:
            print(l)


if __name__ == "__main__":
    main()
