"""GenBank-input prediction + accuracy evaluation parity
(reference evaluateOnTestSet, src/augustus.cc:254; Evaluation,
src/evaluation.cc).

Golden: reference augustus on a 1-sequence subset of chr2L/genes.gb.test
with the test_aug_dev_species parameters (trained by reference etraining),
output filtered like tests/short/utils/aug_out_filter.py eval mode.
"""

import gzip
import os

import pytest

from conftest import has_reference

from test_training import trained_species   # noqa: F401  (fixture reuse)

DATA = os.path.join(os.path.dirname(__file__), "data")


def _filter(text: str):
    lines = text.split("\n")
    start = next(i for i, l in enumerate(lines)
                 if "# ----- sequence number" in l)
    return [l for l in lines[start:]
            if "# total time:" not in l and "command line" not in l]


def test_eval_genbank_byte_exact(trained_species):   # noqa: F811
    if not has_reference():
        pytest.skip("reference not available")
    from augustus_tpu.predict import Model, evaluate_genbank

    cfg = trained_species.parent.parent
    model = Model.load({"species": "test_aug_dev_species",
                        "AUGUSTUS_CONFIG_PATH": str(cfg),
                        "softmasking": "0"})
    got = evaluate_genbank(model, os.path.join(DATA, "genes_test1.gb"))
    with gzip.open(os.path.join(DATA, "golden_eval_test1.out.gz"),
                   "rt") as fh:
        want = fh.read()
    assert _filter(got) == _filter(want)


def test_eval_crf_flag_byte_exact(trained_species):   # noqa: F811
    """Reference CI test_training_new_species_crf flow: etraining (already
    byte-exact via the fixture) then GenBank eval-mode prediction with
    --CRF=on --CRF_N=2 --UTR=off (reference types.cc:242-249: at
    prediction the flag switches the dss/ass maxbinsize defaults; with a
    bin-free parameter set the output must be deterministic and equal the
    reference binary run, golden_eval_crf3.out.gz)."""
    if not has_reference():
        pytest.skip("reference not available")
    from augustus_tpu.predict import Model, evaluate_genbank

    def filt(text):
        lines = text.split("\n")
        start = next(i for i, l in enumerate(lines)
                     if "# ----- sequence number" in l)
        return [l for l in lines[start:]
                if "# total time:" not in l and "command line" not in l
                and " genes_crf3.gb " not in l]

    cfg = trained_species.parent.parent
    model = Model.load({"species": "test_aug_dev_species",
                        "AUGUSTUS_CONFIG_PATH": str(cfg),
                        "softmasking": "0", "UTR": "off",
                        "CRF": "on", "CRF_N": "2"})
    got = evaluate_genbank(model, os.path.join(DATA, "genes_crf3.gb"))
    with gzip.open(os.path.join(DATA, "golden_eval_crf3.out.gz"),
                   "rt") as fh:
        want = fh.read()
    assert filt(got) == filt(want)
