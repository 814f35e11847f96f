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
