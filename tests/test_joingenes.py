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
    src = os.path.join(SRC, "joingenes.cpp")
    if not os.path.exists(BIN) or \
            os.path.getmtime(BIN) < os.path.getmtime(src):
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


# a transcript split at a chunk boundary: 5' part has the start codon,
# 3' part has the stop codon; frames are compatible across the gap
PART_A = """\
chr1\taug\ttranscript\t1000\t1900\t10\t+\t.\tg1.t1
chr1\taug\tstart_codon\t1000\t1002\t.\t+\t0\ttranscript_id "g1.t1"; gene_id "g1";
chr1\taug\tCDS\t1000\t1200\t.\t+\t0\ttranscript_id "g1.t1"; gene_id "g1";
chr1\taug\tCDS\t1500\t1900\t.\t+\t0\ttranscript_id "g1.t1"; gene_id "g1";
"""
PART_B = """\
chr1\taug\ttranscript\t2100\t2600\t9\t+\t.\tg7.t1
chr1\taug\tCDS\t2100\t2399\t.\t+\t1\ttranscript_id "g7.t1"; gene_id "g7";
chr1\taug\tCDS\t2500\t2600\t.\t+\t1\ttranscript_id "g7.t1"; gene_id "g7";
chr1\taug\tstop_codon\t2598\t2600\t.\t+\t0\ttranscript_id "g7.t1"; gene_id "g7";
"""


def test_joingenes_joins_boundary_split_transcript(tmp_path, binary):
    """The namesake joining (reference jg_transcript.cpp joinCall/join/
    joining): the start-complete and stop-complete halves are stitched
    into one frame-consistent transcript; the halves fall to sub-chain
    removal."""
    fa = tmp_path / "a.gtf"
    fb = tmp_path / "b.gtf"
    fa.write_text(PART_A)
    fb.write_text(PART_B)
    out = subprocess.run(
        [binary, "-g", f"{fa},{fb}", "-o", "/dev/stdout"],
        capture_output=True, text=True, check=True).stdout
    cds = [l.split("\t") for l in out.splitlines() if "\tCDS\t" in l]
    assert [(c[3], c[4]) for c in cds] == \
        [("1000", "1200"), ("1500", "1900"),
         ("2100", "2399"), ("2500", "2600")]
    # one gene, one transcript, both codons carried over
    assert sum(1 for l in out.splitlines() if "\tgene\t" in l) == 1
    assert "start_codon" in out and "stop_codon" in out


def test_joingenes_respects_frames_and_nojoin(tmp_path, binary):
    fa = tmp_path / "a.gtf"
    fb = tmp_path / "b.gtf"
    fa.write_text(PART_A)
    # shift the second half's frames so the halves are incompatible
    fb.write_text(PART_B.replace("\t+\t1\t", "\t+\t0\t"))
    out = subprocess.run(
        [binary, "-g", f"{fa},{fb}", "-o", "/dev/stdout"],
        capture_output=True, text=True, check=True).stdout
    assert sum(1 for l in out.splitlines() if "\tgene\t" in l) == 2
    fb.write_text(PART_B)
    out = subprocess.run(
        [binary, "-g", f"{fa},{fb}", "--nojoin", "-o", "/dev/stdout"],
        capture_output=True, text=True, check=True).stdout
    assert sum(1 for l in out.splitlines() if "\tgene\t" in l) == 2
