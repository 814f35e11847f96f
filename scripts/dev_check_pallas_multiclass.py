"""Parity: Pallas kernel (interpret) vs scan on a chunk whose GC class
changes mid-sequence (exercises the mid-block GS refresh + per-step ltc)."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from augustus_tpu import genetics
from augustus_tpu.predict import Model
from augustus_tpu.engine.gold import GoldEngine
from augustus_tpu.engine.device import build_tracks
from augustus_tpu.engine.scan import ScanEngine, make_scan_fn, split_tracks
from augustus_tpu.engine.pallas_scan import PallasEngine
from augustus_tpu.io.fasta import read_fasta

CONFIG = "/root/reference/config"
OFF, N = 300000, 6000     # chrI slice with a class switch at ~3825


def main():
    model = Model.load({"species": "human", "AUGUSTUS_CONFIG_PATH": CONFIG,
                        "UTR": "off", "softmasking": "0"})
    seq = read_fasta("/root/reference/examples/autoAug/genome.fa")[0] \
        .sequence.lower()[OFF: OFF + N]
    codes = genetics.encode(seq)
    eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                     model.decomp, model.gcode)
    eng.prepare(codes)
    ch = np.flatnonzero(np.diff(eng.stairs))
    assert len(ch) >= 1, "no class switch in test chunk"
    tr = build_tracks(eng)

    st, arr = split_tracks(tr)
    fn = jax.jit(make_scan_fn(st, debug_vals=True))
    dev = jax.tree_util.tree_map(jnp.asarray, arr)
    _, (bps, vals) = fn(dev, jnp.asarray(tr.log_init))
    sv = np.asarray(vals)

    pe = PallasEngine(tr, interpret=True)
    pe.run()
    n, S = st.n, tr.S
    pv = pe.v_debug[1:n, :S]
    if not np.array_equal(sv, pv):
        bad = np.argwhere(sv != pv)
        print(f"DIVERGE at {bad.shape[0]} cells; switches at {ch}")
        for (r, s) in bad[:5]:
            print(f"  j={r+1} s={s}: scan={sv[r, s]} pallas={pv[r, s]}")
        return 1
    live = sv > -5.0e29
    b_s = np.asarray(bps)
    b_p = pe.backptr[1:n, :S]
    assert ((b_s == b_p) | ~live).all(), "live backpointers diverge"
    se = ScanEngine(tr)
    se.run()
    assert se.traceback() == pe.traceback()
    print(f"multiclass parity OK: n={n} switches={ch.tolist()} "
          f"PHW={pe.static.PHW}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
