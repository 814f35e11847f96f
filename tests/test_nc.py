"""NcModel acceptance tests (reference src/ncmodel.cc).

Covers the two configurations the noncoding model supports:
  * --nc=on without hints: nc exon states are inert (ncmodel.cc:744-826
    precomputeTxEndProbs leaves the boundary tracks empty), output must
    still be byte-exact through the DEFAULT engine path (device engines
    raise UnsupportedByDevice for nc states and predict falls back to gold).
  * --nc=on with tss/tts/exon hints: the only configuration in which nc
    exon states fire; the golden contains a noncoding_transcript.
"""

import os

import pytest

from conftest import REFERENCE_CONFIG, has_reference
from test_gold_engine import normalize

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference config tree not available")

DATA = os.path.join(os.path.dirname(__file__), "data")


def run_nc(fasta, engine="auto", **kw):
    from augustus_tpu.predict import Model, predict_file
    args = {"species": "human", "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
            "UTR": "on", "nc": "on", "softmasking": "0"}
    args.update(kw)
    model = Model.load(args)
    return predict_file(model, fasta, engine=engine)


@pytest.mark.slow
def test_nc_plain_default_engine_exact():
    """--nc=on must decode via the default (auto) engine path: the device
    engine raises UnsupportedByDevice for nc state types and the driver
    falls back to gold transparently (regression: this used to crash with
    an uncaught NotImplementedError)."""
    got = normalize(run_nc(os.path.join(DATA, "HS08198.fa"), engine="auto"))
    want = normalize(open(os.path.join(
        DATA, "golden_human_nc_HS08198.gff")).read())
    assert got == want


@pytest.mark.slow
def test_nc_hints_noncoding_transcript_exact():
    """tss/tts/exon hints make the nc exon states fire; the reference
    predicts a noncoding_transcript (gene.cc:1285 Transcript::printGFF)."""
    got = normalize(run_nc(
        os.path.join(DATA, "HS04636.fa"),
        hintsfile=os.path.join(DATA, "nc_hints.gff"),
        extrinsicCfgFile=os.path.join(
            REFERENCE_CONFIG, "extrinsic", "extrinsic.MPE.cfg")))
    want = normalize(open(os.path.join(
        DATA, "golden_human_nc_hints_HS04636.gff")).read())
    assert any("noncoding_transcript" in l for l in want)
    assert got == want
