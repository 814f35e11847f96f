"""Benchmark: semi-Markov Viterbi decode throughput (Mb/s) on device.

Decodes a real genomic chunk (C. elegans chrI from the reference examples)
with the human model (UTR off, no hints) using the Pallas DP kernel
(engine/pallas_scan.py) and reports warm-run throughput as ONE JSON line.

Baseline: the reference AUGUSTUS 3.5.0 C++ binary, same input/model/flags,
measured on this machine's CPU: 200 kb in 2.43 s = 0.082 Mb/s single-core
(see BASELINE.md; the repo publishes no absolute throughput numbers).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MBPS = 0.082   # reference binary, human model, 200kb chrI chunk
CHUNK = int(os.environ.get("BENCH_CHUNK", 20000))
GENOME = "/root/reference/examples/autoAug/genome.fa"
CONFIG = "/root/reference/config"


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from augustus_tpu import genetics
    from augustus_tpu.predict import Model
    from augustus_tpu.engine.gold import GoldEngine
    from augustus_tpu.engine.device import build_tracks
    from augustus_tpu.engine.pallas_scan import PallasEngine
    from augustus_tpu.io.fasta import read_fasta

    model = Model.load({"species": "human", "AUGUSTUS_CONFIG_PATH": CONFIG,
                        "UTR": "off", "softmasking": "0"})
    if os.path.exists(GENOME):
        seq = read_fasta(GENOME)[0].sequence.lower()[:CHUNK]
    else:
        rng = np.random.default_rng(0)
        seq = "".join(rng.choice(list("acgt"), size=CHUNK,
                                 p=[.29, .21, .21, .29]))
    codes = genetics.encode(seq)
    n = codes.shape[0]

    eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                     model.decomp, model.gcode)
    t0 = time.time()
    eng.prepare(codes)
    tracks = build_tracks(eng)
    pe = PallasEngine(tracks)
    prep_s = time.time() - t0

    t0 = time.time()
    pe.run()
    compile_s = time.time() - t0

    dev = {k: jnp.asarray(v) for k, v in pe.arrays.items()}
    times = []
    for _ in range(3):
        t0 = time.time()
        out = pe._jit(dev)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    dt = min(times)
    mbps = n / dt / 1e6

    sys.stderr.write(
        f"# bench: n={n} device={jax.devices()[0].platform} "
        f"prep={prep_s:.1f}s compile={compile_s:.1f}s decode={dt:.2f}s\n")
    print(json.dumps({"metric": "viterbi_decode_mbps", "value": round(mbps, 5),
                      "unit": "Mb/s", "vs_baseline":
                      round(mbps / BASELINE_MBPS, 4)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
