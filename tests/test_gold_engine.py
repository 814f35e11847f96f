"""Acceptance tests: byte-exact GFF output vs reference AUGUSTUS goldens.

The golden files in tests/data/ were produced by the reference C++ binary
(AUGUSTUS 3.5.0) with the same species parameters; comparison starts at the
first '# ----- prediction' line and excludes the trailing command-line echo,
matching the reference CI comparison (tests/short/utils/aug_out_filter.py).
"""

import os

import pytest

from conftest import REFERENCE_CONFIG, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference config tree not available")

DATA = os.path.join(os.path.dirname(__file__), "data")


def normalize(text: str):
    lines = text.splitlines()
    start = next((i for i, l in enumerate(lines)
                  if l.startswith("# ----- prediction")), 0)
    out = []
    for l in lines[start:]:
        if l.startswith("# command line") or l.startswith("# ../") or \
                l.startswith("# /") or l.startswith("# ./") or \
                l.startswith("# total time"):
            continue
        out.append(l)
    return out


def run_prediction(fasta, **kw):
    from augustus_tpu.predict import Model, predict_file
    args = {"species": "human", "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
            "UTR": "off", "softmasking": "0"}
    args.update(kw)
    model = Model.load(args)
    return predict_file(model, fasta)


@pytest.mark.slow
def test_example_noutr_exact():
    got = normalize(run_prediction("/root/reference/examples/example.fa"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_noutr_example.gff")).read())
    assert got == want


@pytest.mark.slow
def test_reverse_strand_exact():
    got = normalize(run_prediction(os.path.join(DATA, "HS04636rc.fa")))
    want = normalize(open(os.path.join(
        DATA, "golden_human_noutr_HS04636rc.gff")).read())
    assert got == want


@pytest.mark.slow
def test_utr_on_exact():
    """Matches the reference test_utr_on configuration
    (tests/short/examples/test_examples.py:297)."""
    got = normalize(run_prediction("/root/reference/examples/example.fa",
                                   UTR="on"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_utr_example.gff")).read())
    assert got == want


@pytest.mark.slow
def test_utr_on_reverse_exact():
    got = normalize(run_prediction(os.path.join(DATA, "HS04636rc.fa"),
                                   UTR="on"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_utr_HS04636rc.gff")).read())
    assert got == want


@pytest.mark.slow
def test_softmask_noutr_exact():
    """Softmasked input -> RM nonexonpart hints + evidence blocks."""
    got = normalize(run_prediction(os.path.join(DATA, "HS04636sm.fa"),
                                   softmasking="1"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_sm_noutr.gff")).read())
    assert got == want


@pytest.mark.slow
def test_softmask_utr_exact():
    got = normalize(run_prediction(os.path.join(DATA, "HS04636sm3.fa"),
                                   UTR="on", softmasking="1"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_sm3_utr.gff")).read())
    assert got == want


@pytest.mark.slow
def test_hints_mpe_exact():
    """Matches the reference test_hints_MPE configuration
    (tests/short/examples/test_examples.py:681)."""
    from augustus_tpu.predict import Model, predict_file
    model = Model.load({
        "species": "human", "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
        "hintsfile": "/root/reference/examples/hints.gff",
        "extrinsicCfgFile":
            REFERENCE_CONFIG + "/extrinsic/extrinsic.MPE.cfg"})
    got = normalize(predict_file(model, "/root/reference/examples/example.fa"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_mpe_hints.gff")).read())
    assert got == want


@pytest.mark.slow
def test_default_softmasking_on_exact():
    """Default run (softmasking on, no lowercase): the reference still
    activates the hints system (extrinsicinfo.cc:1723) and prints evidence
    blocks; byte-exact against the reference binary with no flags."""
    got = normalize(run_prediction("/root/reference/examples/example.fa",
                                   softmasking="1"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_default_example.gff")).read())
    assert got == want


@pytest.mark.slow
def test_piecewise_exact():
    """Piecewise decoding (doViterbiPiecewise + getNextCutEndPoint):
    byte-exact against the reference with --maxDNAPieceSize=3000."""
    got = normalize(run_prediction("/root/reference/examples/example.fa",
                                   softmasking="1",
                                   maxDNAPieceSize="3000"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_piece3000_example.gff")).read())
    assert got == want


@pytest.mark.slow
def test_prediction_range_exact():
    """--predictionStart/--predictionEnd cut + global coordinates
    (reference cutRelevantPiece, augustus.cc:552)."""
    got = normalize(run_prediction("/root/reference/examples/example.fa",
                                   predictionStart="3000",
                                   predictionEnd="8000"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_predrange.gff")).read())
    assert got == want


@pytest.mark.slow
def test_strand_backward_exact():
    got = normalize(run_prediction(os.path.join(DATA, "HS04636rc.fa"),
                                   strand="backward"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_strand_backward.gff")).read())
    assert got == want
