"""evaluate / getSeq standalone CLI entries (reference src/evaluate.cc,
src/getSeq.cc)."""
import subprocess
import sys

import pytest

from conftest import has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference data not present")

GB = "/root/reference/examples/chr2L/genes.gb.train"
GENOME = "/root/reference/examples/autoAug/genome.fa"


def _run(mod, *args):
    return subprocess.run([sys.executable, "-m", mod, *args],
                          capture_output=True, text=True, cwd="/root/repo")


def test_evaluate_self_is_perfect(tmp_path):
    recs = open(GB).read().split("//\n")
    small = tmp_path / "small.gb"
    small.write_text("//\n".join(recs[:3]) + "//\n")
    r = _run("augustus_tpu.cli.evaluate", str(small), str(small))
    assert r.returncode == 0, r.stderr
    gene_rows = [l for l in r.stdout.splitlines() if "gene level" in l]
    assert gene_rows and "|           1 |           1 |" in gene_rows[0]


def test_getseq_subsequence_and_rc(tmp_path):
    tbl = tmp_path / "sf.tbl"
    tbl.write_text(f"hum\t{GENOME}\n")
    r = _run("augustus_tpu.cli.getSeq", "--species=hum", "--seq=chrI",
             f"--speciesfilenames={tbl}", "--start=101", "--end=130")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    fwd = lines[1]
    assert len(fwd) == 30
    r2 = _run("augustus_tpu.cli.getSeq", "--species=hum", "--seq=chrI",
              f"--speciesfilenames={tbl}", "--start=101", "--end=130",
              "--rc")
    rc = r2.stdout.splitlines()[1]
    comp = str.maketrans("ACGTacgtNn", "TGCAtgcaNn")
    assert rc == fwd[::-1].translate(comp)
