"""--translation_table wiring: the chosen table takes priority over the
{ochre,amber,opal}prob stop scoring (reference src/exonmodel.cc:216,
src/geneticcode.cc:25-90) and reshapes the ORF stop barriers.
"""
import numpy as np
import pytest

from conftest import REFERENCE_CONFIG, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference config not present")


def _eng(table):
    from augustus_tpu.predict import Model
    from augustus_tpu.engine.gold import GoldEngine
    from augustus_tpu.io.fasta import read_fasta
    from augustus_tpu import genetics
    model = Model.load({"species": "human",
                        "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
                        "UTR": "off", "softmasking": "0",
                        "translation_table": str(table)})
    seq = read_fasta("/root/reference/examples/example.fa")[0].sequence
    codes = genetics.encode(seq.lower()[:4000])
    eng = GoldEngine(model.sg, model.cn, model.igp, model.exp, model.inp,
                     model.decomp, model.gcode)
    eng.prepare(codes)
    return eng


def test_table6_removes_taa_tag_stops():
    from augustus_tpu import genetics
    t1 = _eng(1)
    t6 = _eng(6)          # ciliate code: taa/tag -> Q, only tga stops
    assert t6.gcode.is_stop[genetics.codon_index("tga")]
    assert not t6.gcode.is_stop[genetics.codon_index("taa")]
    assert not t6.gcode.is_stop[genetics.codon_index("tag")]
    # end-of-exon stop scores: strictly fewer scoring positions
    live1 = np.isfinite(t1.end_stop_fwd)
    live6 = np.isfinite(t6.end_stop_fwd)
    assert live6.sum() < live1.sum()
    assert not (live6 & ~live1).any()     # no NEW stop positions
    # ORF barriers relax: nearest-stop positions move left or vanish
    assert (t6.orf["fwd"] <= t1.orf["fwd"]).all()
    assert (t6.orf["fwd"] < t1.orf["fwd"]).any()


def test_table1_matches_default():
    t1 = _eng(1)
    td = _eng("1")
    assert np.array_equal(np.isfinite(t1.end_stop_fwd),
                          np.isfinite(td.end_stop_fwd))


def test_tables_match_reference_source():
    """Byte parity of every translation table + start-codon mask with the
    reference's arrays (src/geneticcode.cc:57-101), parsed from source."""
    import os
    import re
    from augustus_tpu import genetics as G
    src = os.path.join(os.path.dirname(REFERENCE_CONFIG), "src",
                       "geneticcode.cc")
    if not os.path.exists(src):
        pytest.skip("reference source not present")
    text = open(src).read()
    strings = re.findall(r'"([A-Z*\-]{64})"', text)
    aa = [s for s in strings if "-" not in s]
    masks = [s for s in strings if "-" in s]
    ref_tables = dict(zip([1, 2, 3, 4, 5, 6, 9, 10, 11, 12, 13, 14, 15, 16,
                           21, 22, 23, 24], aa))
    ref_masks = dict(zip([1, 2, 3, 4, 5, 6, 9, 10, 11, 12, 13, 14, 15, 16,
                          21, 22, 23, 24], masks))
    assert G._TRANSLATION_TABLES == ref_tables
    assert G._START_CODON_MASKS == ref_masks
    for t, s in ref_tables.items():
        gc = G.GeneticCode(t)
        assert "".join(gc.aa_of_codon) == s
        assert set(gc.start_codons) == {
            i for i, ch in enumerate(ref_masks[t]) if ch == "M"}
