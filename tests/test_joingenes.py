"""joingenes (native C++ tool) golden test.

Reference: auxprogs/joingenes — merge gene sets with priorities:
duplicate transcripts keep the best variant, CDS sub-chains are removed,
lower-priority transcripts contradicting a kept higher-priority one are
discarded (jg_transcript.h selection / search_n_destroy_doublings /
search_n_destroy_parts).
"""

import os
import subprocess

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "..", "native", "joingenes")
BIN = os.path.join(SRC, "joingenes")

A = """\
chr1\ttest\ttranscript\t100\t900\t0.5\t+\t.\tt1
chr1\ttest\tCDS\t100\t200\t.\t+\t0\ttranscript_id "t1"; gene_id "g1";
chr1\ttest\tCDS\t300\t500\t.\t+\t1\ttranscript_id "t1"; gene_id "g1";
chr1\ttest\tCDS\t700\t900\t.\t+\t0\ttranscript_id "t1"; gene_id "g1";
chr1\ttest\ttranscript\t2000\t2300\t0.9\t+\t.\tt2
chr1\ttest\tCDS\t2000\t2300\t.\t+\t0\ttranscript_id "t2"; gene_id "g2";
"""

# duplicate of t1 (same CDS chain, lower score), a sub-chain of t1, and a
# contradicting overlap of t2
B = """\
chr1\ttest\ttranscript\t100\t900\t0.2\t+\t.\tu1
chr1\ttest\tCDS\t100\t200\t.\t+\t0\ttranscript_id "u1"; gene_id "h1";
chr1\ttest\tCDS\t300\t500\t.\t+\t1\ttranscript_id "u1"; gene_id "h1";
chr1\ttest\tCDS\t700\t900\t.\t+\t0\ttranscript_id "u1"; gene_id "h1";
chr1\ttest\ttranscript\t320\t500\t0.9\t+\t.\tu2
chr1\ttest\tCDS\t320\t500\t.\t+\t1\ttranscript_id "u2"; gene_id "h2";
chr1\ttest\ttranscript\t2100\t2400\t0.8\t+\t.\tu3
chr1\ttest\tCDS\t2100\t2400\t.\t+\t0\ttranscript_id "u3"; gene_id "h3";
"""


@pytest.fixture(scope="module")
def binary():
    if not os.path.exists(BIN):
        subprocess.run(["make"], cwd=SRC, check=True, capture_output=True)
    return BIN


def test_merge_dedup_selection(binary, tmp_path):
    fa = tmp_path / "a.gtf"
    fb = tmp_path / "b.gtf"
    fa.write_text(A)
    fb.write_text(B)
    out = tmp_path / "out.gtf"
    subprocess.run([binary, "-g", f"{fa},{fb}", "-p", "2,1",
                    "-o", str(out)], check=True)
    text = out.read_text()
    cds = [l for l in text.splitlines() if "\tCDS\t" in l]
    txl = [l for l in text.splitlines() if "\ttranscript\t" in l]
    # t1 kept once (duplicate u1 and sub-chain u2 removed), t2 kept
    # (contradicting u3 is lower priority)
    assert len(txl) == 2
    assert len(cds) == 4
    assert "2400" not in text and "320\t500" not in text


def test_alternatives_keeps_contradictions(binary, tmp_path):
    fa = tmp_path / "a.gtf"
    fb = tmp_path / "b.gtf"
    fa.write_text(A)
    fb.write_text(B)
    out = tmp_path / "out.gtf"
    subprocess.run([binary, "-g", f"{fa},{fb}", "-p", "2,1",
                    "--alternatives", "-o", str(out)], check=True)
    text = out.read_text()
    txl = [l for l in text.splitlines() if "\ttranscript\t" in l]
    assert len(txl) == 3          # u3 survives as an alternative
