"""SQLite genome/hint store for CGP (reference test_cgp_sqlite analogue).

The reference CI builds a local SQLite DB on the fly
(tests/short/examples/test_examples.py init_sqlite_db) and asserts the
DB-backed CGP run equals the in-memory one; here the access layer itself
is checked for exact equality against MemSeqAccess, chunk reassembly
across boundaries included, plus hint loading."""

import os

import pytest

from augustus_tpu.cgp.seq_access import MemSeqAccess
from augustus_tpu.cgp.sqlite_db import (SQLiteAccess, load2sqlitedb,
                                        load_hints2sqlitedb)

CGP_DIR = "/root/reference/examples/cgp"

pytestmark = pytest.mark.skipif(not os.path.isdir(CGP_DIR),
                                reason="reference cgp example missing")


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    dbfile = str(tmp_path_factory.mktemp("db") / "cgp.db")
    for spec, fa in (("hg19", "human.fa"), ("mm9", "mouse.fa"),
                     ("bosTau4", "cow.fa"), ("galGal3", "chicken.fa")):
        # small chunks force multi-chunk reassembly on every query
        load2sqlitedb(dbfile, spec, os.path.join(CGP_DIR, fa),
                      chunksize=1000)
    load_hints2sqlitedb(dbfile, "hg19",
                        os.path.join(CGP_DIR, "human.hints.gff"))
    return dbfile


def test_sqlite_matches_mem_access(db):
    mem = MemSeqAccess(os.path.join(CGP_DIR, "genomes.tbl"))
    sql = SQLiteAccess(db, os.path.join(CGP_DIR, "genomes.tbl"))
    assert sql.species() == mem.species()
    for spec in sql.species():
        g = mem._genome(spec)
        for seqid in g:
            n = mem.seq_len(spec, seqid)
            assert sql.seq_len(spec, seqid) == n
            # whole sequence, chunk-boundary straddles, and both strands
            assert sql.get_seq(spec, seqid, 0, n - 1) == \
                mem.get_seq(spec, seqid, 0, n - 1)
            for (a, b) in ((990, 2010), (0, 999), (1000, 1000),
                           (n - 10, n - 1)):
                b = min(b, n - 1)
                assert sql.get_seq(spec, seqid, a, b) == \
                    mem.get_seq(spec, seqid, a, b), (spec, seqid, a, b)
            assert sql.get_seq(spec, seqid, 10, 500, strand="-") == \
                mem.get_seq(spec, seqid, 10, 500, strand="-")


def test_sqlite_hints(db):
    sql = SQLiteAccess(db)
    seqid = next(l.split()[0] for l in
                 open(os.path.join(CGP_DIR, "human.hints.gff"))
                 if l.strip() and not l.startswith("#"))
    hints = sql.get_hints("hg19", seqid, 0, 10 ** 9)
    n_file = sum(1 for l in open(os.path.join(CGP_DIR, "human.hints.gff"))
                 if l.strip() and not l.startswith("#"))
    assert len(hints) == n_file
    src, start, end, score, typ, strand, frame, pri, grp, mult, esrc = \
        hints[0]
    assert typ in ("intron", "ep", "exon", "exonpart", "CDS", "CDSpart",
                   "dss", "ass", "start", "stop")


@pytest.mark.slow
def test_cgp_sqlite_equals_mem(db, tmp_path):
    """DB-backed CGP produces identical GFF to MemSeqAccess (reference
    test_cgp_sqlite)."""
    from augustus_tpu.cgp import CompGenePred
    from augustus_tpu.predict import Model
    model = Model.load({"species": "human",
                        "AUGUSTUS_CONFIG_PATH": "/root/reference/config",
                        "UTR": "off", "softmasking": "0"})
    out_mem = CompGenePred(
        model, f"{CGP_DIR}/tree.nwk", f"{CGP_DIR}/aln.maf",
        f"{CGP_DIR}/genomes.tbl",
        outdir=str(tmp_path / "mem")).start(engine="auto")
    out_db = CompGenePred(
        model, f"{CGP_DIR}/tree.nwk", f"{CGP_DIR}/aln.maf",
        f"{CGP_DIR}/genomes.tbl", outdir=str(tmp_path / "db"),
        dbaccess=db).start(engine="auto")
    for spec in ("hg19", "mm9", "bosTau4", "galGal3"):
        assert out_db[spec] == out_mem[spec]
