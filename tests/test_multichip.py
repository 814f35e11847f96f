"""Multi-device piece-parallel decode: output equality with sequential.

The pieces of a long sequence (fixed by the synch cut-point search) are
independent DPs; predict_sequence shards them over the device mesh
(parallel.mesh.decode_pieces, shard_map over the virtual 8-CPU mesh from
conftest).  Reference equivalent: createAugustusJoblist.pl chunk lists +
join_aug_pred.pl, here with in-process GFF equality as the bar.
"""

import os

import jax
import pytest

from conftest import REFERENCE_CONFIG, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference config tree not available")


@pytest.mark.slow
def test_sharded_pieces_equal_sequential():
    assert jax.device_count() >= 2, "virtual mesh missing"
    from augustus_tpu.io.fasta import FastaRecord, read_fasta
    from augustus_tpu.predict import Model, predict_sequence

    rec = read_fasta("/root/reference/examples/autoAug/genome.fa")[0]
    rec = FastaRecord(name=rec.name, sequence=rec.sequence[:24000])
    base = {"species": "human", "AUGUSTUS_CONFIG_PATH": REFERENCE_CONFIG,
            "UTR": "off", "softmasking": "0", "maxDNAPieceSize": "5000"}

    model_p = Model.load(dict(base, pieceParallel="true"))
    text_p, n_p, _ = predict_sequence(model_p, rec, engine="scan")
    model_s = Model.load(dict(base, pieceParallel="false"))
    text_s, n_s, _ = predict_sequence(model_s, rec, engine="scan")
    assert n_p == n_s
    assert text_p == text_s
