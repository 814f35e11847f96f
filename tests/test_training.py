"""etraining parity: byte-exact .pbl parameter files vs the reference
(test_training_new_species analogue, reference
tests/short/examples/test_examples.py:379).

Goldens in tests/data/train_golden/ were produced by the reference binaries:
  new_species.pl --species=test_aug_dev_species
  etraining examples/chr2L/genes.gb.train --species=test_aug_dev_species
"""

import gzip
import os
import shutil

import pytest

from conftest import has_reference, REFERENCE_CONFIG

DATA = os.path.join(os.path.dirname(__file__), "data", "train_golden")
TRAIN_GB = "/root/reference/examples/chr2L/genes.gb.train"


@pytest.fixture(scope="module")
def trained_species(tmp_path_factory):
    if not has_reference() or not os.path.exists(TRAIN_GB):
        pytest.skip("reference data not available")
    from augustus_tpu.training.new_species import create_species
    from augustus_tpu.training.etraining import run_training

    cfg = tmp_path_factory.mktemp("cfg")
    # minimal config tree: generic template + model configs
    shutil.copytree(os.path.join(REFERENCE_CONFIG, "species", "generic"),
                    cfg / "species" / "generic")
    shutil.copytree(os.path.join(REFERENCE_CONFIG, "model"), cfg / "model")
    create_species("test_aug_dev_species", str(cfg), silent=True)
    run_training({"species": "test_aug_dev_species",
                  "AUGUSTUS_CONFIG_PATH": str(cfg),
                  "queryfile": TRAIN_GB})
    return cfg / "species" / "test_aug_dev_species"


@pytest.mark.parametrize("model", ["exon", "intron", "igenic"])
def test_pbl_byte_exact(trained_species, model):
    got = (trained_species
           / ("test_aug_dev_species_%s_probs.pbl" % model)).read_text()
    with gzip.open(os.path.join(DATA, "%s_probs.pbl.gz" % model), "rt") as fh:
        want = fh.read()
    assert got == want


def test_genbank_reader_counts():
    if not os.path.exists(TRAIN_GB):
        pytest.skip("reference data not available")
    from augustus_tpu.io.genbank import read_genbank, detect_format
    assert detect_format(TRAIN_GB) == "genbank"
    seqs = read_genbank(TRAIN_GB)
    assert len(seqs) == 392
    # every record must have one gene with coding exons
    ngenes = sum(len(s.genes) for s in seqs)
    assert ngenes >= 392
    s0 = seqs[0]
    g0 = s0.genes[0]
    assert g0.exons[0] == (5000, 5137)   # join(5001..5138,...) 0-based
    assert g0.clength % 3 == 0


def test_split_single_gene_seqs():
    if not os.path.exists(TRAIN_GB):
        pytest.skip("reference data not available")
    from augustus_tpu.io.genbank import read_genbank
    from augustus_tpu.training.annotation import split_to_single_gene_seqs
    seqs = read_genbank(TRAIN_GB)
    singles = split_to_single_gene_seqs(seqs)
    assert len(singles) >= len(seqs)
    for s in singles:
        assert len(s.genes) == 1
        g = s.genes[0]
        assert g.strand == "+"
        assert 0 <= g.codingstart <= g.codingend < s.length


@pytest.fixture(scope="module")
def utr_trained_species(tmp_path_factory):
    """Train with --UTR=on on a small mRNA-annotated set (the reference
    binary run that produced the golden: etraining tests/data/utrtrain.gb
    --species=usp --UTR=on)."""
    if not has_reference():
        pytest.skip("reference data not available")
    from augustus_tpu.training.new_species import create_species
    from augustus_tpu.training.etraining import run_training

    cfg = tmp_path_factory.mktemp("ucfg")
    shutil.copytree(os.path.join(REFERENCE_CONFIG, "species", "generic"),
                    cfg / "species" / "generic")
    shutil.copytree(os.path.join(REFERENCE_CONFIG, "model"), cfg / "model")
    create_species("usp", str(cfg), silent=True)
    gb = os.path.join(os.path.dirname(__file__), "data", "utrtrain.gb")
    run_training({"species": "usp", "AUGUSTUS_CONFIG_PATH": str(cfg),
                  "UTR": "on", "queryfile": gb})
    return cfg / "species" / "usp"


def test_utr_training_byte_exact(utr_trained_species):
    """UtrModel::buildModel parity (src/utrtrain.cc): TSS/TTS models,
    length distributions, UTR emission chains — byte-exact .pbl."""
    got = open(utr_trained_species / "usp_utr_probs.pbl").read()
    with gzip.open(os.path.join(DATA, "utr_probs.pbl.gz"), "rt") as fh:
        want = fh.read()
    assert got == want


@pytest.mark.slow
def test_crf_training_updates_weights(tmp_path_factory):
    """CRF OLM training (reference test_training_new_species_crf
    analogue): HMM-train on hsackI10, then CRF-train against held-out
    chr2L genes whose structures the model mispredicts — the margin
    update must fire and the emission tables must stay distributions."""
    import numpy as np
    from augustus_tpu.io.genbank import read_genbank
    from augustus_tpu.predict import Model
    from augustus_tpu.training.annotation import split_to_single_gene_seqs
    from augustus_tpu.training.crf import CRFTrainer
    from augustus_tpu.training.etraining import run_training
    from augustus_tpu.training.new_species import create_species

    cfg = tmp_path_factory.mktemp("crfcfg")
    shutil.copytree(os.path.join(REFERENCE_CONFIG, "species", "generic"),
                    cfg / "species" / "generic")
    shutil.copytree(os.path.join(REFERENCE_CONFIG, "model"), cfg / "model")
    create_species("crf_species", str(cfg), silent=True)
    run_training({"species": "crf_species",
                  "AUGUSTUS_CONFIG_PATH": str(cfg),
                  "queryfile": "/root/reference/examples/hsackI10.gb"})
    model = Model.load({"species": "crf_species",
                        "AUGUSTUS_CONFIG_PATH": str(cfg),
                        "UTR": "off", "softmasking": "0"})
    anno = read_genbank("/root/reference/examples/chr2L/genes.gb.train")
    singles = split_to_single_gene_seqs(anno)[:2]
    before = [np.array(model.exp.gc[0].emiprobs[f]) for f in range(3)]
    crf = CRFTrainer(model, rounds=1, chunksize=2)
    crf.train(singles, engine="auto", log=lambda *a: None)
    assert crf.num_seen == 2
    changed = any(not np.allclose(before[f], model.exp.gc[0].emiprobs[f])
                  for f in range(3))
    assert changed, "CRF update did not move the emission weights"
    for f in range(3):
        p = np.asarray(model.exp.gc[0].emiprobs[f]).reshape(-1, 4)
        assert np.allclose(p.sum(axis=1), 1.0, atol=1e-9)
