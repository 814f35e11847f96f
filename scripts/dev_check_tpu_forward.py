"""TPU-vs-gold forward-table parity (ADVICE round-3 item).

The device ForwardEngine (f32 logsumexp scan) replaces the f64 host
forward for sampling/MEA runs; the byte-exact sampling goldens are
CPU-verified only.  This check runs both on the CURRENT default platform
(run on the TPU) and reports the forward-table deviation and whether any
OptionsList draw boundary could flip at the published rand() resolution
(2^-31): a flip needs |delta posterior| ~ ulp of the draw, so max |dF|
and the min gap between competing option weights are the two numbers
that matter.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    from augustus_tpu import genetics
    from augustus_tpu.predict import Model
    from augustus_tpu.engine.gold import GoldEngine
    from augustus_tpu.engine.device import build_tracks
    from augustus_tpu.engine.scan import ForwardEngine
    from augustus_tpu.io.fasta import read_fasta

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    model = Model.load({"species": "human",
                        "AUGUSTUS_CONFIG_PATH": "/root/reference/config",
                        "UTR": "off", "softmasking": "0"})
    seq = read_fasta("/root/reference/examples/example.fa")[0] \
        .sequence.lower()[:n]
    codes = genetics.encode(seq)
    gold = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                      model.decomp, model.gcode)
    gold.run(codes, need_forward=True)
    f_gold = np.array(gold.f, dtype=np.float64)

    gold2 = GoldEngine(model.sg, model.cn, model.igp, model.exp,
                       model.inp, model.decomp, model.gcode)
    gold2.prepare(codes)
    tracks = build_tracks(gold2)
    fe = ForwardEngine(tracks, n_true=n)
    f_dev = fe.run()

    live = np.isfinite(f_gold) & np.isfinite(f_dev)
    both_live = (np.isfinite(f_gold) == np.isfinite(f_dev)).all()
    d = np.abs(f_gold - f_dev)[live]
    print(f"platform={jax.devices()[0].platform} n={n} "
          f"live_cells={live.sum()} support_equal={both_live}")
    print(f"max|dF|={d.max():.3e} mean|dF|={d.mean():.3e} "
          f"p99.9|dF|={np.percentile(d, 99.9):.3e}")
    # normalized per-column posteriors: what the sampler draws from
    ok = True
    for j in range(1, n, 997):
        g = f_gold[j][np.isfinite(f_gold[j])]
        v = f_dev[j][np.isfinite(f_dev[j])]
        if g.size != v.size or g.size == 0:
            continue
        pg = np.exp(g - g.max()); pg /= pg.sum()
        pv = np.exp(v - v.max()); pv /= pv.sum()
        if np.abs(pg - pv).max() > 2 ** -31:
            ok = False
    print(f"draw-boundary safe at 2^-31 on sampled columns: {ok}")
    return 0

if __name__ == "__main__":
    sys.exit(main())
