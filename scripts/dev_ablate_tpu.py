"""Ablation study: attribute the per-step cost of the TPU scan engine.

Compiles and times variants of the scan with component groups removed to
find where the ~190us/step goes. Run on the real TPU.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from augustus_tpu import genetics
    from augustus_tpu.predict import Model
    from augustus_tpu.engine.gold import GoldEngine
    from augustus_tpu.engine.device import build_tracks
    from augustus_tpu.engine.scan import split_tracks, make_scan_fn
    from augustus_tpu.io.fasta import read_fasta

    n_chunk = int(os.environ.get("BENCH_CHUNK", 20000))
    model = Model.load({"species": "human",
                        "AUGUSTUS_CONFIG_PATH": "/root/reference/config",
                        "UTR": "off", "softmasking": "0"})
    seq = read_fasta("/root/reference/examples/autoAug/genome.fa")[0] \
        .sequence.lower()[:n_chunk]
    codes = genetics.encode(seq)
    eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                     model.decomp, model.gcode)
    eng.prepare(codes)
    tracks = build_tracks(eng)
    static, arrays = split_tracks(tracks)
    print(f"# NL={static.NL} S={static.S} chain={len(static.chain)} "
          f"fixed={len(static.fixed)} lessd={len(static.lessd)} "
          f"pinned={len(static.pinned)} convs={len(static.convs)} "
          f"variants={sum(len(c.variants) for c in static.convs)}",
          flush=True)

    v0 = jnp.asarray(tracks.log_init)
    dev_arrays = jax.tree_util.tree_map(jnp.asarray, arrays)

    def bench(name, st):
        fn = jax.jit(make_scan_fn(st))
        t0 = time.time()
        vfin, bps = fn(dev_arrays, v0)
        np.asarray(vfin)
        comp = time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.time()
            vfin, bps = fn(dev_arrays, v0)
            np.asarray(vfin)
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{name:28s} compile={comp:6.1f}s decode={dt:6.2f}s "
              f"per_step={dt/n_chunk*1e6:7.1f}us", flush=True)

    R = dataclasses.replace
    bench("full", static)
    bench("no_convs", R(static, convs=()))
    bench("no_lessd", R(static, lessd=()))
    bench("no_convs_no_lessd", R(static, convs=(), lessd=()))
    bench("chain_only", R(static, convs=(), lessd=(), fixed=(), pinned=()))
    half = static.convs[: len(static.convs) // 2]
    bench("half_convs", R(static, convs=half))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
