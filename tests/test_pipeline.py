"""Pipeline-layer tests (reference scripts/ equivalents)."""

import os
import textwrap

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_join_aug_pred_dedups_overlap_genes():
    """reference scripts/join_aug_pred.pl: identical boundary genes from
    adjacent chunks collapse; genes are renumbered g1..gN."""
    from augustus_tpu.pipeline.chunking import join_aug_pred
    c1 = textwrap.dedent("""\
        # start gene g1
        chr1\tAUGUSTUS\tgene\t100\t200\t1\t+\t.\tg1
        chr1\tAUGUSTUS\tCDS\t100\t200\t.\t+\t0\ttranscript_id "g1.t1"; gene_id "g1";
        # end gene g1
        # start gene g2
        chr1\tAUGUSTUS\tgene\t900\t990\t1\t+\t.\tg2
        chr1\tAUGUSTUS\tCDS\t900\t990\t.\t+\t0\ttranscript_id "g2.t1"; gene_id "g2";
        # end gene g2
        """)
    c2 = textwrap.dedent("""\
        # start gene g1
        chr1\tAUGUSTUS\tgene\t900\t990\t1\t+\t.\tg1
        chr1\tAUGUSTUS\tCDS\t900\t990\t.\t+\t0\ttranscript_id "g1.t1"; gene_id "g1";
        # end gene g1
        # start gene g2
        chr1\tAUGUSTUS\tgene\t1500\t1600\t1\t+\t.\tg2
        chr1\tAUGUSTUS\tCDS\t1500\t1600\t.\t+\t0\ttranscript_id "g2.t1"; gene_id "g2";
        # end gene g2
        """)
    out = join_aug_pred([c1, c2])
    genes = [l for l in out.splitlines() if "\tgene\t" in l]
    assert len(genes) == 3                      # duplicate dropped
    assert [g.split("\t")[8] for g in genes] == ["g1", "g2", "g3"]
    assert 'gene_id "g3"' in out


def test_split_and_joblist(tmp_path):
    from augustus_tpu.pipeline.chunking import make_joblist, split_mfasta
    fa = tmp_path / "g.fa"
    fa.write_text(">a\n" + "acgt" * 300 + "\n>b\n" + "ttaa" * 200 + "\n")
    files = split_mfasta(str(fa), str(tmp_path), min_size=1000)
    assert len(files) == 2
    jobs = make_joblist(str(fa), chunk_size=500, overlap=100)
    assert jobs[0] == ("a", 1, 500)
    assert jobs[1][0] == "a" and jobs[1][1] == 401


def test_psl_to_hints():
    from augustus_tpu.pipeline.hints_gen import psl_to_hints
    # one query: two blocks separated by a 1000bp gap (an intron)
    psl = ("100\t0\t0\t0\t0\t0\t0\t1000\t+\tq1\t100\t0\t100\t"
           "chr1\t50000\t1000\t2200\t2\t50,50,\t0,50,\t1000,2150,")
    hints = psl_to_hints([psl])
    types = [h.split("\t")[2] for h in hints]
    # blat2hints abbreviates exonpart to "ep" (verified byte-exact vs
    # the reference scripts/blat2hints.pl)
    assert types.count("ep") == 2
    assert types.count("intron") == 1
    intron = [h for h in hints if "\tintron\t" in h][0].split("\t")
    assert (int(intron[3]), int(intron[4])) == (1051, 2150)


def test_join_mult_hints():
    from augustus_tpu.pipeline.hints_gen import join_mult_hints
    lines = [
        "chr1\tb2h\tintron\t100\t200\t0\t+\t.\tsrc=E;grp=a",
        "chr1\tb2h\tintron\t100\t200\t0\t+\t.\tsrc=E;grp=b",
        "chr1\tb2h\tintron\t300\t400\t0\t+\t.\tsrc=E",
    ]
    out = join_mult_hints(lines)
    assert len(out) == 2
    assert out[0].split("\t")[8].startswith("mult=2")


def test_gff2gb_roundtrip(tmp_path):
    """gff2gbSmallDNA output must be readable by our GenBank reader."""
    from augustus_tpu.pipeline.trainprep import gff2gb, random_split
    from augustus_tpu.io.genbank import read_genbank
    fa = tmp_path / "g.fa"
    seq = "".join("acgt"[(i * 7) % 4] for i in range(2000))
    seq = seq[:500] + "atg" + seq[503:900] + "taa" + seq[903:]
    fa.write_text(">chr1\n" + seq + "\n")
    gff = tmp_path / "a.gff"
    gff.write_text(
        'chr1\ttest\tCDS\t501\t600\t.\t+\t0\ttranscript_id "t1";\n'
        'chr1\ttest\tCDS\t801\t903\t.\t+\t1\ttranscript_id "t1";\n')
    out = tmp_path / "out.gb"
    gff2gb(str(gff), str(fa), flank=100, out=str(out))
    annos = read_genbank(str(out))
    assert len(annos) == 1
    a = annos[0]
    assert len(a.genes) == 1
    assert a.genes[0].exons == [(100, 199), (400, 502)]
    # random split
    tr, te = random_split(str(out), 0)
    assert os.path.exists(tr) and os.path.exists(te)


def test_gtf2gff3():
    from augustus_tpu.pipeline.convert import gtf_to_gff3
    lines = [
        "chr1\tA\tgene\t1\t10\t.\t+\t.\tg1",
        "chr1\tA\ttranscript\t1\t10\t.\t+\t.\tg1.t1",
        'chr1\tA\tCDS\t1\t10\t.\t+\t0\ttranscript_id "g1.t1"; '
        'gene_id "g1";',
    ]
    out = gtf_to_gff3(lines)
    # byte-format matches the perl script: no version line, trailing ';'
    assert out[0] == "chr1\tA\tgene\t1\t10\t.\t+\t.\tID=g1;"
    assert any("ID=g1.t1;Parent=g1;" in l for l in out)
    assert any("Parent=g1.t1;" in l for l in out)


def test_metapars_parsing():
    from augustus_tpu.pipeline.optimize import parse_metapars
    path = "/root/reference/config/species/generic/generic_metapars.cfg"
    if not os.path.exists(path):
        pytest.skip("no reference config")
    pars = parse_metapars(path)
    names = [n for n, _ in pars]
    assert "/Constant/dss_end" in names
    d = dict(pars)
    assert "1" in d["/Constant/dss_end"] and "4" in d["/Constant/dss_end"]


def test_exonerate2hints():
    """scripts/exonerate2hints.pl semantics: cds -> CDSpart trimmed by
    the cutoff, intron within bounds, grp from the gene line."""
    from augustus_tpu.pipeline.hints_gen import exonerate_to_hints
    lines = [
        "chr1\texonerate:protein2genome:local\tgene\t100\t900\t800\t+\t."
        "\tgene_id 1 ; sequence protX ; gene_orientation +\n",
        "chr1\texonerate:protein2genome:local\tcds\t100\t400\t.\t+\t.\t\n",
        "chr1\texonerate:protein2genome:local\tintron\t401\t700\t.\t+\t.\t\n",
        "chr1\texonerate:protein2genome:local\tintron\t701\t720\t.\t+\t.\t\n",
        "chr1\texonerate:protein2genome:local\tcds\t880\t890\t.\t+\t.\t\n",
    ]
    out = exonerate_to_hints(lines)
    assert out[0] == ("chr1\txnt2h\tCDSpart\t115\t385\t.\t+\t.\t"
                      "src=XNT;grp=protX;pri=4")
    # the 300bp intron passes, the 20bp one is dropped
    assert sum("\tintron\t" in l for l in out) == 1
    # short cds collapses to the midpoint
    assert "\tCDSpart\t885\t885\t" in out[-1]


def test_polya2hints():
    from augustus_tpu.pipeline.hints_gen import polya_to_hints
    row = ["est1", "chr2", "+"] + ["x"] * 6 + ["1234"] + ["x", "x"]
    out = polya_to_hints(["\t".join(row)], fmt="new")
    assert out == ["chr2\tpolyA\ttts\t1224\t1244\t.\t+\t.\t"
                   "pri=4;src=E;est=est1"]
    out = polya_to_hints(["\t".join(row)], fmt="new", swapstrand=True)
    assert "\t-\t" in out[0]


@pytest.mark.slow
def test_optimize_augustus_real_run(tmp_path):
    """Run the metaparameter optimizer for real once (reference
    optimize_augustus.pl: train -> predict -> evaluate loop), on a tiny
    2-fold, 1-round, single-metaparameter setup."""
    import shutil
    from conftest import REFERENCE_CONFIG
    from augustus_tpu.pipeline.optimize import optimize
    from augustus_tpu.training.new_species import create_species

    cfg = tmp_path / "cfg"
    (cfg / "species").mkdir(parents=True)
    shutil.copytree(os.path.join(REFERENCE_CONFIG, "species", "generic"),
                    cfg / "species" / "generic")
    shutil.copytree(os.path.join(REFERENCE_CONFIG, "model"), cfg / "model")
    create_species("opt_species", str(cfg), silent=True)

    # a small training set: first 6 single-gene records of chr2L
    src = "/root/reference/examples/chr2L/genes.gb.train"
    recs = open(src).read().split("//\n")
    small = tmp_path / "small.gb"
    small.write_text("//\n".join(recs[:6]) + "//\n")

    metapars = tmp_path / "metapars.cfg"
    metapars.write_text('/IGenicModel/k  "3"-"4"\n')

    chosen = optimize("opt_species", str(cfg), str(small),
                      metapars_path=str(metapars), kfold=2, rounds=1,
                      workdir=str(tmp_path / "opt"), engine="auto")
    assert chosen.get("/IGenicModel/k") in ("3", "4")


def test_gb2gff_and_summarize():
    from augustus_tpu.pipeline.convert import gb_to_gff, summarize_acgt
    lines = gb_to_gff("/root/reference/examples/hsackI10.gb")
    assert any("\tgene\t" in l for l in lines)
    cds = [l for l in lines if "\tCDS\t" in l]
    assert cds and all('transcript_id "' in l for l in cds)
    out = summarize_acgt("/root/reference/examples/example.fa")
    assert out[-2] == "total 11797bp"
    assert out[-3].startswith("summary: BASE COUNT")
    assert out[-1].startswith("gc: 0.418")


def test_filter_genes(tmp_path):
    """scripts/filterGenes.pl: records named in the list are dropped."""
    from augustus_tpu.pipeline.trainprep import filter_genes
    gb = ("LOCUS AAA 10 bp\nORIGIN\n  1 acgtacgtac\n//\n"
          "LOCUS BBB 10 bp\nORIGIN\n  1 acgtacgtac\n//\n")
    db = tmp_path / "db.gb"
    db.write_text(gb)
    names = tmp_path / "bad.lst"
    names.write_text("AAA\n")
    out = filter_genes(str(names), str(db))
    assert "LOCUS BBB" in out and "LOCUS AAA" not in out
    assert out.count("//") == 1


def test_transmap2hints_matches_perl_semantics(tmp_path):
    """Byte-exact goldens captured from running the reference
    scripts/transMap2hints.pl on synthetic genePred inputs (stored
    in-test; the port preserves the script's quirks incl. the numeric
    'cmpl' comparison and the per-iteration exonpart flush)."""
    import io
    from augustus_tpu.pipeline.transmap2hints import TransMap2Hints
    gp = ("mrna1-1\tchr1\t+\t1000\t5000\t1500\t4500\t3\t"
          "1000,2500,4000,\t2000,3000,5000,\t0\tx\tcmpl\tcmpl\t0,1,2\t"
          "1,1,\n")
    out = io.StringIO()
    TransMap2Hints(out).run(io.StringIO(gp))
    lines = out.getvalue().splitlines()
    # exact output of the perl script on this record
    assert lines[0] == ("chr1\tt2h\ttss\t901\t1101\t0\t+\t0\t"
                        "grp=mrna1-1;src=T;pri=4")
    assert ("chr1\tt2h\tstart\t1486\t1518\t0\t+\t0\t"
            "grp=mrna1-1;src=T;pri=4") in lines
    assert ("chr1\tt2h\tstop\t4483\t4515\t0\t+\t0\t"
            "grp=mrna1-1;src=T;pri=4") in lines
    assert any(l.startswith("chr1\tt2h\tintron\t2001\t2500") or
               l.startswith("chr1\tt2h\tintron\t3001\t4000")
               for l in lines)
    assert any("\tCDSpart\t" in l for l in lines)
    assert any("\tUTRpart\t" in l for l in lines)
