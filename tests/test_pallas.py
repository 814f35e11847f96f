"""Pallas DP kernel vs the XLA scan engine (interpret mode on CPU).

The Pallas kernel (engine/pallas_scan.py) mirrors the scan engine's step
math op-for-op; here we check bit-exact equality of per-step Viterbi values
and of backpointers on live states, plus traceback-path equality, on a real
genomic chunk spanning multiple kernel blocks (exercises the block-shift,
LM-flush and pinned-history paths).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from augustus_tpu import genetics
from augustus_tpu.predict import Model
from augustus_tpu.engine.gold import GoldEngine
from augustus_tpu.engine.device import build_tracks
from augustus_tpu.engine.scan import ScanEngine, make_scan_fn, split_tracks
from augustus_tpu.engine.pallas_scan import PallasEngine
from augustus_tpu.io.fasta import read_fasta

CONFIG = "/root/reference/config"
EXAMPLE = "/root/reference/examples/example.fa"


@pytest.fixture(scope="module")
def tracks():
    model = Model.load({"species": "human", "AUGUSTUS_CONFIG_PATH": CONFIG,
                        "UTR": "off", "softmasking": "0"})
    seq = read_fasta(EXAMPLE)[0].sequence.lower()[:2500]
    codes = genetics.encode(seq)
    eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                     model.decomp, model.gcode)
    eng.prepare(codes)
    return build_tracks(eng)


@pytest.mark.slow
def test_pallas_matches_scan(tracks):
    tr = tracks
    st, arr = split_tracks(tr)
    fn = jax.jit(make_scan_fn(st, debug_vals=True))
    dev = jax.tree_util.tree_map(jnp.asarray, arr)
    _, (bps, vals) = fn(dev, jnp.asarray(tr.log_init))
    sv = np.asarray(vals)                       # (n-1, S), rows j=1..n-1

    pe = PallasEngine(tr, interpret=True)
    pe.run()
    n, S = st.n, tr.S
    pv = pe.v_debug[1:n, :S]

    assert np.array_equal(sv, pv), "per-step Viterbi values diverge"

    live = sv > -5.0e29
    b_s = np.asarray(bps)
    b_p = pe.backptr[1:n, :S]
    assert ((b_s == b_p) | ~live).all(), "live backpointers diverge"

    se = ScanEngine(tr)
    se.run()
    assert np.array_equal(se.v_final, pe.v_final)
    assert se.traceback() == pe.traceback()


@pytest.mark.slow
def test_pallas_hinted_parity():
    """Sparse exon/CDS hint machinery in-kernel: bit-exact per-step
    values, live backpointers and traceback vs the scan engine on a
    hinted chunk (promoted from scripts/dev_check_pallas_hints.py)."""
    import os
    from augustus_tpu.hints.system import parse_gff_hints
    N = 6000
    model = Model.load({
        "species": "human", "AUGUSTUS_CONFIG_PATH": CONFIG,
        "UTR": "off", "softmasking": "0",
        "hintsfile": "/root/reference/examples/hints.gff",
        "extrinsicCfgFile": os.path.join(CONFIG, "extrinsic",
                                         "extrinsic.MPE.cfg")})
    seq = read_fasta("/root/reference/examples/HS04636.fa")[0] \
        .sequence.lower()[:N]
    codes = genetics.encode(seq)
    hints = [f for f in model.gff_hints["HS04636"] if f.end < N]
    eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                     model.decomp, model.gcode, ext_cfg=model.ext_cfg)
    eng.prepare(codes, gff_hints=hints)
    tr = build_tracks(eng)
    assert getattr(eng, "_device_sparse_hints", False)

    st, arr = split_tracks(tr)
    fn = jax.jit(make_scan_fn(st, debug_vals=True))
    dev = jax.tree_util.tree_map(jnp.asarray, arr)
    _, (bps, vals) = fn(dev, jnp.asarray(tr.log_init))
    sv = np.asarray(vals)

    pe = PallasEngine(tr, interpret=True)
    pe.run()
    n, S = st.n, tr.S
    assert pe.static.NHW > 0
    assert np.array_equal(sv, pe.v_debug[1:n, :S])
    live = sv > -5.0e29
    assert ((np.asarray(bps) == pe.backptr[1:n, :S]) | ~live).all()
    se = ScanEngine(tr)
    se.run()
    assert se.traceback() == pe.traceback()


@pytest.mark.slow
def test_pallas_multiclass_parity():
    """Mid-block GC-class switching via GS re-DMA: bit-exact vs scan on a
    chrI slice with a class switch (promoted from
    scripts/dev_check_pallas_multiclass.py)."""
    OFF, N = 300000, 6000
    model = Model.load({"species": "human", "AUGUSTUS_CONFIG_PATH": CONFIG,
                        "UTR": "off", "softmasking": "0"})
    seq = read_fasta("/root/reference/examples/autoAug/genome.fa")[0] \
        .sequence.lower()[OFF: OFF + N]
    codes = genetics.encode(seq)
    eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                     model.decomp, model.gcode)
    eng.prepare(codes)
    assert np.flatnonzero(np.diff(eng.stairs)).size >= 1
    tr = build_tracks(eng)

    st, arr = split_tracks(tr)
    fn = jax.jit(make_scan_fn(st, debug_vals=True))
    dev = jax.tree_util.tree_map(jnp.asarray, arr)
    _, (bps, vals) = fn(dev, jnp.asarray(tr.log_init))
    sv = np.asarray(vals)

    pe = PallasEngine(tr, interpret=True)
    pe.run()
    n, S = st.n, tr.S
    assert np.array_equal(sv, pe.v_debug[1:n, :S])
    live = sv > -5.0e29
    assert ((np.asarray(bps) == pe.backptr[1:n, :S]) | ~live).all()
    se = ScanEngine(tr)
    se.run()
    assert se.traceback() == pe.traceback()
