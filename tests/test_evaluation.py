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
