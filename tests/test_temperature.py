"""--temperature sampling heating (reference include/types.hh:387,
lldouble.hh heated()): the forward/sampling distribution is flattened by
taking transEmiProb^((8-t)/8); the Viterbi path must be unaffected.
"""
import numpy as np
import pytest

from conftest import REFERENCE_CONFIG, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference config not present")


def _gold(temp):
    from augustus_tpu.predict import Model
    from augustus_tpu.engine.gold import GoldEngine
    from augustus_tpu.io.fasta import read_fasta
    from augustus_tpu import genetics
    model = Model.load({"species": "human",
                        "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
                        "UTR": "off", "softmasking": "0",
                        "temperature": str(temp)})
    seq = read_fasta("/root/reference/examples/example.fa")[0].sequence
    codes = genetics.encode(seq.lower()[:3000])
    eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                     model.decomp, model.gcode)
    eng.run(codes, need_forward=True)
    return eng


def test_temperature_heats_forward_not_viterbi():
    cold = _gold(0)
    hot = _gold(7)
    assert hot.cn.temperature == 7
    # Viterbi identical
    assert cold.traceback() == hot.traceback()
    # forward tables differ (heated recursion flattens the distribution)
    fc, fh = cold.f, hot.f
    live = np.isfinite(fc) & np.isfinite(fh)
    assert live.any()
    assert np.abs(np.where(live, fc - fh, 0.0)).max() > 1.0
    # posteriors flatten: the top state hogs less mass when heated
    j = fc.shape[0] - 1

    def top_share(f):
        w = f[j][np.isfinite(f[j])]
        p = np.exp(w - w.max())
        return p.max() / p.sum()
    assert top_share(fh) <= top_share(fc) + 1e-12
