import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from augustus_tpu import genetics
from augustus_tpu.predict import Model
from augustus_tpu.engine.gold import GoldEngine
from augustus_tpu.engine.device import build_tracks
from augustus_tpu.engine.scan import split_tracks, make_scan_fn

model = Model.load({"species": "human", "AUGUSTUS_CONFIG_PATH": "/root/reference/config",
                    "UTR": "off", "softmasking": "0"})
K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
arrs = []
for k in range(K):
    rng = np.random.default_rng(k)
    seq = "".join(rng.choice(list("acgt"), size=n, p=[.29,.21,.21,.29]))
    codes = genetics.encode(seq)
    eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp, model.decomp, model.gcode)
    eng.prepare(codes)
    tracks = build_tracks(eng)
    static, arrays = split_tracks(tracks)
    arrs.append(arrays)
print("tracks built", flush=True)
stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *arrs)
fn = jax.jit(jax.vmap(make_scan_fn(static)))
dev = jax.tree_util.tree_map(jnp.asarray, stacked)
v0 = jnp.broadcast_to(jnp.asarray(tracks.log_init), (K, tracks.S))
t0=time.time(); vfin, bps = fn(dev, v0); _=np.asarray(vfin); print(f"compile+run {time.time()-t0:.1f}s", flush=True)
t0=time.time(); vfin, bps = fn(dev, v0); _=np.asarray(vfin); dt=time.time()-t0
print(f"warm {dt:.2f}s -> aggregate {K*n/dt/1e6:.4f} Mb/s ({dt/n*1e6:.1f} us/step for K={K})")
