"""Parity: Pallas kernel (interpret on CPU) vs scan engine on a HINTED run
(exonpart/exon/CDS sparse hint machinery in-kernel)."""
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
from augustus_tpu.hints.system import parse_gff_hints
from augustus_tpu.io.fasta import read_fasta

CONFIG = "/root/reference/config"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 2500


def main():
    model = Model.load({
        "species": "human", "AUGUSTUS_CONFIG_PATH": CONFIG,
        "UTR": "off", "softmasking": "0",
        "hintsfile": "/root/reference/examples/hints.gff",
        "extrinsicCfgFile": os.path.join(CONFIG, "extrinsic",
                                         "extrinsic.MPE.cfg")})
    seq = read_fasta("/root/reference/examples/HS04636.fa")[0] \
        .sequence.lower()[:N]
    codes = genetics.encode(seq)
    hints = model.gff_hints["HS04636"]
    hints = [f for f in hints if f.end < N]
    eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                     model.decomp, model.gcode, ext_cfg=model.ext_cfg)
    eng.prepare(codes, gff_hints=hints)
    tr = build_tracks(eng)
    assert getattr(eng, "_device_sparse_hints", False), \
        "test input produced no sparse hints"

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
        print(f"DIVERGE at {bad.shape[0]} cells; first:", bad[:10])
        for (r, s) in bad[:5]:
            print(f"  j={r+1} s={s}: scan={sv[r, s]} pallas={pv[r, s]}")
        return 1
    live = sv > -5.0e29
    b_s = np.asarray(bps)
    b_p = pe.backptr[1:n, :S]
    if not ((b_s == b_p) | ~live).all():
        bad = np.argwhere((b_s != b_p) & live)
        print("BP DIVERGE:", bad[:10])
        return 1
    se = ScanEngine(tr)
    se.run()
    assert se.traceback() == pe.traceback()
    print(f"hint parity OK: n={n} NHW={pe.static.NHW} "
          f"hint_convs={sum(1 for c in pe.static.convs if c.hint)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
