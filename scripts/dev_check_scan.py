"""Dev harness: compare the scan engine path against the gold engine."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")

import numpy as np
from augustus_tpu import genetics
from augustus_tpu.predict import Model
from augustus_tpu.engine.gold import GoldEngine
from augustus_tpu.engine.device import build_tracks
from augustus_tpu.engine.scan import ScanEngine
from augustus_tpu.io.fasta import read_fasta
from augustus_tpu.model.state_config import TYPE_TO_IDENTIFIER

model = Model.load({"species": "human",
                    "AUGUSTUS_CONFIG_PATH": "/root/reference/config",
                    "UTR": "off", "softmasking": "0"})
fa = read_fasta(sys.argv[1] if len(sys.argv) > 1
                else "/root/reference/examples/HS04636.fa")
codes = genetics.encode(fa[0].sequence.lower())
print(f"n = {codes.shape[0]}")

eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                 model.decomp, model.gcode)
t0 = time.time()
eng.run(codes)
gold_path = eng.traceback()
print(f"gold: {time.time()-t0:.1f}s, {len(gold_path)} segments")

t0 = time.time()
tracks = build_tracks(eng)
print(f"tracks: {time.time()-t0:.1f}s, pool arrays: {len(tracks.pool)}, "
      f"pool MB: {sum(a.nbytes for a in tracks.pool)/1e6:.0f}")
t0 = time.time()
se = ScanEngine(tracks)
se.run()
print(f"scan: {time.time()-t0:.1f}s")
scan_path = se.traceback()
print(f"scan path: {len(scan_path)} segments")

gp = [(b, e, TYPE_TO_IDENTIFIER[t]) for b, e, t in gold_path]
sp = [(b, e, TYPE_TO_IDENTIFIER[t]) for b, e, t in scan_path]
if gp == sp:
    print("PATHS IDENTICAL")
else:
    print(f"PATHS DIFFER: gold {len(gp)} vs scan {len(sp)}")
    for i in range(max(len(gp), len(sp))):
        a = gp[i] if i < len(gp) else None
        b = sp[i] if i < len(sp) else None
        if a != b:
            print(f"  seg {i}: gold={a} scan={b}")
            if i > 50:
                break
