import numpy as np
import pytest

from augustus_tpu import genetics
from augustus_tpu.properties import init_properties
from augustus_tpu.constants import Constants
from augustus_tpu.model.state_config import parse_state_config, ST
from augustus_tpu.model import pbl, gc as gcmod
from augustus_tpu.io.fasta import read_fasta

from conftest import REFERENCE_CONFIG, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference config tree not available")


def human_props(**kw):
    args = {"species": "human", "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG}
    args.update(kw)
    return init_properties(args)


def test_encode_kmers():
    codes = genetics.encode("acgtn")
    assert list(codes) == [0, 1, 2, 3, 4]
    ids = genetics.kmer_ids(genetics.encode("acgt"), 2)
    # ac=0*4+1=1, cg=1*4+2=6, gt=2*4+3=11
    assert list(ids) == [1, 6, 11]
    rc = genetics.rc_kmer_ids(genetics.encode("ac"), 2)
    # rc('ac') digit0=comp(a)=t=3, digit1=comp(c)=g=2 -> 3 + 2*4 = 11 ('gt')
    assert list(rc) == [11]


def test_stop_codons():
    code = genetics.GeneticCode()
    s = genetics.encode("ttaatagatgatt")
    stops = code.stop_at(s)
    assert stops[1] and not stops[0]       # taa at 1; tta at 0 is not a stop
    assert code.translate(genetics.encode("atggattaa")) == "MD*"
    rc = code.rc_stop_at(genetics.encode("ttaxx"))
    assert rc[0]  # tta = reverse complement of taa


def test_properties_architecture_selection():
    p = human_props()
    assert p.get("transfile") == "trans_shadow_partial.pbl"
    p2 = human_props(UTR="on")
    assert p2.get("transfile") == "trans_shadow_partial_utr.pbl"
    assert p2.get_int("/NAMGene/statecount") == 71
    assert p.get_int("/NAMGene/statecount") == 47


def test_constants_from_properties():
    cn = Constants.from_properties(human_props())
    assert cn.trans_init_window == 22
    assert cn.ass_upwindow_size == 33
    assert cn.dss_whole_size == 3 + 2 + 4
    assert cn.decomp_num_steps == 2
    assert cn.max_exon_len == 15000


def test_state_graph_partial():
    p = human_props()
    sg = parse_state_config(p)
    assert sg.statecount == 47
    assert sg.state_types[0] == ST.igenic
    assert sg.state_types[1] == ST.singleG
    assert sg.state_types[8] == ST.terminal
    assert sg.state_types[9] == ST.lessD0
    assert sg.state_types[24] == ST.rsingleG
    assert abs(sg.transitions.sum(axis=1) - 1).max() < 1e-4
    assert sg.init_probs.sum() == pytest.approx(1.0, abs=1e-4)
    assert sg.reachable_states().all()


def test_state_graph_utr():
    p = human_props(UTR="on")
    sg = parse_state_config(p)
    assert sg.statecount == 71
    assert sg.state_types[24] == ST.utr5single
    assert sg.state_types[36] == ST.rsingleG
    # human species-specific transition matrix should be picked up
    assert sg.transitions[0, 0] > 0.999


def test_igenic_pbl():
    p = human_props()
    cn = Constants.from_properties(p)
    par = pbl.read_igenic_pbl(p.species_file("_igenic_probs.pbl"),
                              cn.decomp_num_steps)
    assert par.k == 4
    assert len(par.gc) == 2
    assert par.gc[0].pls[0].shape == (4,)
    assert par.gc[0].pls[0][0] == pytest.approx(0.283)
    assert par.gc[0].emiprobs.shape == (1024,)
    # each conditional block of 4 should roughly sum to 1
    s = par.gc[0].emiprobs.reshape(-1, 4).sum(axis=1)
    assert np.allclose(s, 1.0, atol=0.02)


def test_exon_pbl():
    p = human_props()
    cn = Constants.from_properties(p)
    par = pbl.read_exon_pbl(p.species_file("_exon_probs.pbl"),
                            cn.decomp_num_steps, cn)
    assert par.k == 4
    assert par.exon_len_d == 3000
    assert len(par.gc) == 2
    assert par.len_dist["single"][:201].sum() == 0  # min_coding_len zeroed
    assert par.len_dist["internal"].shape == (15001,)
    assert par.len_dist["internal"][15000] > 0       # geometric tail filled
    assert par.gc[0].trans_init_motif.n == 22
    assert par.gc[0].trans_init_motif.k == 3
    assert par.gc[0].emiprobs.shape == (3, 1024)
    # values are probabilities (rounded to few significant digits in the file)
    assert par.gc[0].emiprobs.min() >= 0
    assert 0.9 < par.gc[0].emiprobs.reshape(3, -1, 4).sum(-1).mean() < 1.1


def test_intron_pbl():
    p = human_props()
    cn = Constants.from_properties(p)
    par = pbl.read_intron_pbl(p.species_file("_intron_probs.pbl"),
                              cn.decomp_num_steps, cn, p)
    assert par.d == 584
    assert par.ass_probs.shape == (4 ** 5,)
    assert par.dss_probs.shape == (4 ** 7,)
    assert par.ass_bin.nbins == 37
    assert par.dss_bin.nbins > 0
    assert len(par.gc) == 2
    assert par.gc[0].prob_short_intron == pytest.approx(0.116)
    assert par.gc[0].mal == pytest.approx(7200)
    assert par.gc[0].ass_motif.n == 33


def test_gc_stairs_two_classes():
    p = human_props()
    cn = Constants.from_properties(p)
    decomp = gcmod.make_decomposition(cn, p)
    assert decomp.n_classes == 2
    assert decomp.weighing_type == 3
    recs = read_fasta("/root/reference/examples/HS04636.fa")
    codes = genetics.encode(recs[0].sequence.lower())
    stairs = gcmod.compute_stairs(codes, cn, decomp)
    assert stairs.shape[0] == len(recs[0].sequence)
    assert set(np.unique(stairs)) <= {0, 1}


def test_fasta_reader():
    recs = read_fasta("/root/reference/examples/example.fa")
    assert recs[0].name == "HS04636"
    assert len(recs[0]) == 9453
    assert len(recs) == 2
