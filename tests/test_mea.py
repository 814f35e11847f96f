"""MEA decoding parity (reference src/mea.cc, src/graph.cc, src/meaPath.cc).

Goldens: reference augustus --mea=1 --sample=100 on examples/example.fa,
human model, UTR off/on; byte-exact including sampled posteriors (glibc
rand stream) and the order-determined zero-score longest path (logreg
scoring defaults).
"""

import gzip
import os

import pytest

from conftest import has_reference, REFERENCE_CONFIG

DATA = os.path.join(os.path.dirname(__file__), "data")
EXAMPLE = "/root/reference/examples/example.fa"


def _run(utr: str) -> str:
    from augustus_tpu.predict import Model, predict_file
    model = Model.load({"species": "human",
                        "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
                        "softmasking": "0", "UTR": utr, "sample": "100",
                        "mea": "1"})
    return predict_file(model, EXAMPLE)


def _body(text: str):
    return [l for l in text.split("\n") if l and not l.startswith("#")]


@pytest.mark.parametrize("utr,golden", [
    ("off", "golden_human_mea_sample100.gff.gz"),
    ("on", "golden_human_mea_utr_sample100.gff.gz"),
])
def test_mea_byte_exact(utr, golden):
    if not has_reference() or not os.path.exists(EXAMPLE):
        pytest.skip("reference not available")
    got = _body(_run(utr))
    with gzip.open(os.path.join(DATA, golden), "rt") as fh:
        want = _body(fh.read())
    assert got == want
