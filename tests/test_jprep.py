"""Device-prep (engine/jgold + pallas_prep) parity vs the host pipeline.

The fused path builds every packed kernel table ON DEVICE from codes +
stairs + sparse hint overlays; these tests trace it with the CPU backend
and compare against the host (float64 numpy) pipeline: statics must be
EQUAL, integer/boolean tables exact, float tables within f32 rounding of
the host values (the DD compensated cumsums keep large-magnitude tracks
to ~1 ulp).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_CONFIG, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference config not present")

GENOME = "/root/reference/examples/autoAug/genome.fa"
HINTS = "/root/reference/examples/autoAug/hints.E.gff"


def _build_pair(n, with_hints):
    from augustus_tpu.predict import Model
    from augustus_tpu.engine.gold import GoldEngine
    from augustus_tpu.engine.jgold import JGold, build_overlays
    from augustus_tpu.engine.device import build_tracks
    from augustus_tpu.engine.pallas_pack import pack_tracks, compute_cls_blk
    from augustus_tpu.engine import xputil as U
    from augustus_tpu.io.fasta import read_fasta
    from augustus_tpu import genetics
    from augustus_tpu.model import gc as gcmod

    args = {"species": "human", "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
            "UTR": "off", "softmasking": "1" if with_hints else "0"}
    if with_hints:
        args.update(hintsfile=HINTS, extrinsicCfgFile=os.path.join(
            REFERENCE_CONFIG, "extrinsic", "extrinsic.M.RM.E.W.cfg"))
    model = Model.load(args)
    seq = read_fasta(GENOME)[0].sequence[:n]
    codes = genetics.encode(seq.upper())
    sm = np.frombuffer(seq.encode(), dtype=np.uint8) >= ord('a')
    ghl = [f for f in model.gff_hints.get("chrI", [])
           if f.end < n] if with_hints and model.gff_hints else None

    gold = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                      model.decomp, model.gcode, ext_cfg=model.ext_cfg)
    gold.set_boundaries(False, False)
    gold.prepare(codes, softmask=sm if with_hints else None, gff_hints=ghl)
    hstat, harr = pack_tracks(build_tracks(gold))

    jg = JGold(model.sg, model.cn, model.igp, model.exp, model.inp,
               model.decomp, model.gcode, ext_cfg=model.ext_cfg)
    jg.set_boundaries(False, False)
    meta, ov = build_overlays(gold.hints, n)
    stairs = gcmod.compute_stairs(codes, model.cn, model.decomp)
    cls_blk = compute_cls_blk(stairs, n)
    cell = {}

    def fullrun(codes_d, stairs_d, ovd, cb):
        with U.use_jax():
            jg.device_prepare(codes_d, stairs_d, meta, ovd)
            static, arrays = pack_tracks(build_tracks(jg), cls_blk=cb)
        cell["static"] = static
        return arrays

    darr = jax.jit(fullrun)(jnp.asarray(codes.astype(np.int32)),
                            jnp.asarray(stairs.astype(np.int32)),
                            {k: jnp.asarray(v) for k, v in ov.items()},
                            jnp.asarray(cls_blk))
    darr = jax.tree_util.tree_map(np.asarray, darr)
    return hstat, harr, cell["static"], darr


@pytest.mark.slow
@pytest.mark.parametrize("with_hints", [False, True])
def test_device_prep_matches_host(with_hints):
    hstat, harr, dstat, darr = _build_pair(9000, with_hints)
    for f in ("S", "NL", "C", "NGR", "NMS", "NSEL", "LVP", "chain_states",
              "fixed_groups", "lessd", "pinned", "convs", "gate_lane",
              "cls_lane", "NHW", "PHW", "n", "n_pad"):
        assert getattr(hstat, f) == getattr(dstat, f), f
    for k in sorted(harr):
        h = np.asarray(harr[k])
        d = np.asarray(darr[k])
        assert h.shape == d.shape, k
        if h.size == 0:
            continue
        if h.dtype.kind in "iub" or d.dtype.kind in "iub":
            assert np.array_equal(h, d), k
            continue
        hf = np.maximum(np.nan_to_num(h, neginf=-1e30), -1e30)
        df = np.maximum(np.nan_to_num(d, neginf=-1e30), -1e30)
        live_h = hf > -1e29
        assert (live_h == (df > -1e29)).all(), f"{k}: support differs"
        diff = np.abs(np.where(live_h, hf - df, 0.0))
        # tolerance: a few f32 ulps of the stored magnitude
        tol = 4e-3 + 3e-6 * np.abs(np.where(live_h, hf, 0.0))
        assert (diff <= tol).all(), \
            f"{k}: max diff {diff.max()} at {np.argwhere(diff > tol)[:3]}"
