"""TPU diagnostic: split device_dp into prep-graph vs kernel time at N.

Times (a) the prep-graph alone (jit returning the packed arrays),
(b) the full fused fn (prep + expand + kernel).  Difference = kernel+expand.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import bench
from augustus_tpu.predict import Model
from augustus_tpu.engine.gold import GoldEngine
from augustus_tpu.engine.jgold import JGold, build_overlays
from augustus_tpu.engine.device import build_tracks
from augustus_tpu.engine.pallas_pack import pack_tracks, compute_cls_blk
from augustus_tpu.engine import xputil as U
from augustus_tpu.io.fasta import read_fasta
from augustus_tpu import genetics
from augustus_tpu.model import gc as gcmod
from augustus_tpu.hints.system import SeqHints
from augustus_tpu.hints.features import softmask_hints

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

    jg = JGold(model.sg, model.cn, model.igp, model.exp, model.inp,
               model.decomp, model.gcode, ext_cfg=model.ext_cfg)
    jg.set_boundaries(False, False)
    feats = []
    for grp in softmask_hints(sm[:n], model.ext_cfg):
        feats.extend(grp.hints)
    feats.extend(ghl)
    hints = SeqHints(feats, model.ext_cfg, codes)
    meta, ov = build_overlays(hints, n)
    stairs = gcmod.compute_stairs(codes, model.cn, model.decomp)
    cls_blk = compute_cls_blk(stairs, n)
    cell = {}

    def prep_only(codes_d, stairs_d, ovd, cb):
        with U.use_jax():
            jg.device_prepare(codes_d, stairs_d, meta, ovd)
            static, arrays = pack_tracks(build_tracks(jg), cls_blk=cb)
        cell["static"] = static
        return arrays

    def full(codes_d, stairs_d, ovd, cb):
        from .engine import nothing  # placeholder

    args = (jnp.asarray(codes.astype(np.int32)),
            jnp.asarray(stairs.astype(np.int32)),
            {k: jnp.asarray(v) for k, v in ov.items()},
            jnp.asarray(cls_blk))

    fnp = jax.jit(prep_only)
    t0 = time.time()
    out = fnp(*args)
    jax.block_until_ready(out)
    print(f"prep-graph cold: {time.time()-t0:.1f}s")
    for _ in range(2):
        t0 = time.time()
        out = fnp(*args)
        jax.block_until_ready(out)
        print(f"prep-graph warm: {time.time()-t0:.2f}s")

    from augustus_tpu.engine.pallas_prep import _make_fused
    jg2 = JGold(model.sg, model.cn, model.igp, model.exp, model.inp,
                model.decomp, model.gcode, ext_cfg=model.ext_cfg)
    jg2.set_boundaries(False, False)
    ffn, cell2 = _make_fused(jg2, meta, n)
    t0 = time.time()
    bps, vfin = ffn(*args)
    jax.block_until_ready((bps, vfin))
    print(f"full cold: {time.time()-t0:.1f}s")
    for _ in range(2):
        t0 = time.time()
        bps, vfin = ffn(*args)
        jax.block_until_ready((bps, vfin))
        print(f"full warm: {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
