"""bam2hints parity vs the reference CI expected output
(tests/short/auxprogs/bam2hints)."""

import io
import os

import pytest

from augustus_tpu.pipeline.bam import BamReader
from augustus_tpu.pipeline.bam2hints import Bam2Hints

TDIR = "/root/reference/tests/short/auxprogs/bam2hints"
BAM = os.path.join(TDIR, "test_files", "test.s.sorted.bam")
EXPECTED = os.path.join(TDIR, "expected_results", "test.intron.gff")

pytestmark = pytest.mark.skipif(not os.path.exists(BAM),
                                reason="reference bam2hints data missing")


def test_bam_reader():
    bam = BamReader(BAM)
    assert len(bam.ref_names) > 0
    als = list(bam)
    assert als, "no alignments parsed"
    a = als[0]
    assert a.cigar and all(op in "MIDNSHP=X" for _, op in a.cigar)
    assert 0 <= a.ref_id < len(bam.ref_names)


def test_bam2hints_matches_reference_expected():
    """Byte-exact vs the reference CI golden (default options =
    --intronsonly)."""
    out = io.StringIO()
    Bam2Hints().run(BAM, out)
    assert out.getvalue() == open(EXPECTED).read()


def test_bam2hints_exon_mode():
    out = io.StringIO()
    Bam2Hints(introns_only=False, ss_on=True).run(BAM, out)
    text = out.getvalue()
    assert "\texonpart\t" in text
    assert "\tintron\t" in text
    assert "\tDSS\t" in text and "\tASS\t" in text
    # intron hints are unchanged by the exon mode
    introns = [l for l in text.splitlines() if "\tintron\t" in l]
    want = [l for l in open(EXPECTED).read().splitlines()]
    assert sorted(introns) == sorted(want)


def test_bam2wig(tmp_path):
    """auxprogs/bam2wig semantics: M blocks add depth, N/D gaps do not;
    variableStep per reference."""
    import io
    from augustus_tpu.pipeline.wig import bam_to_wig
    out = io.StringIO()
    bam_to_wig(BAM, out, trackname="t")
    text = out.getvalue()
    assert text.startswith("track name=t type=wiggle_0\n")
    assert "variableStep chrom=" in text
    # every emitted line has positive depth at a 1-based position
    depths = [int(l.split()[1]) for l in text.splitlines()
              if l and l[0].isdigit()]
    assert depths and all(d > 0 for d in depths)
    # intron (N) gaps from the hint test must be coverage-free: the six
    # reference introns lie strictly between covered exon blocks
    cov = {}
    chrom = None
    for l in text.splitlines():
        if l.startswith("variableStep"):
            chrom = l.split("chrom=")[1]
            cov[chrom] = set()
        elif l and l[0].isdigit():
            cov[chrom].add(int(l.split()[0]))
    for line in open(EXPECTED):
        f = line.split("\t")
        mid = (int(f[3]) + int(f[4])) // 2
        assert mid not in cov.get(f[0], set()), "intron middle covered"


def test_aln2wig():
    import io
    from augustus_tpu.pipeline.wig import psl_to_wig
    psl = ("10\t0\t0\t0\t0\t0\t0\t0\t+\tq1\t10\t0\t10\tchrX\t100\t20\t30"
           "\t2\t5,5,\t0,5,\t20,40,\n")
    out = io.StringIO()
    psl_to_wig([psl], out)
    text = out.getvalue()
    assert "variableStep chrom=chrX" in text
    lines = dict(tuple(map(int, l.split())) for l in text.splitlines()
                 if l and l[0].isdigit())
    assert lines == {p + 1: 1 for p in
                     list(range(20, 25)) + list(range(40, 45))}
