"""PPX: .prfl parsing, fastBlockSearch and pp_simScore parity.

Goldens were produced by the reference binaries (fastBlockSearch,
pp_simScore from AUGUSTUS 3.5.0) on a deterministic planted sequence /
the shipped examples; the outputs here must match byte-for-byte
(fastBlockSearch) or in all printed digits (pp_simScore).
"""

import os

import numpy as np
import pytest

from augustus_tpu import genetics
from augustus_tpu.ppx.fastblock import format_results, search
from augustus_tpu.ppx.profile import AA_SYMBOLS, Profile
from augustus_tpu.ppx.simscore import SimilarityScore

HERE = os.path.dirname(__file__)
PRFL = "/root/reference/examples/profile/PF00171.15.prfl"
SIMDIR = "/root/reference/examples/sim-score"

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/examples"),
    reason="reference examples not available")


def _planted_sequence() -> str:
    """Consensus codons of every block embedded in random DNA (the
    fixture the stored reference goldens were generated from)."""
    prfl = Profile(PRFL)
    gc = genetics.GeneticCode(1)
    aa2codon = {}
    for cid in range(64):
        aa = str(gc.aa_of_codon[cid])
        if aa not in aa2codon:
            aa2codon[aa] = "".join(
                "acgt"[(cid >> (2 * (2 - i))) & 3] for i in range(3))
    rng = np.random.RandomState(42)

    def rand_dna(n):
        return "".join("acgt"[i] for i in rng.randint(0, 4, n))

    parts = [rand_dna(999)]
    for b in prfl.blocks:
        cons = "".join(AA_SYMBOLS[int(np.argmax(b.values[i]))]
                       for i in range(b.size))
        parts.append("".join(aa2codon[a] for a in cons))
        parts.append(rand_dna(60))
    parts.append(rand_dna(900))
    return "".join(parts)


def test_profile_parse():
    prfl = Profile(PRFL)
    # 20 blocks in the file; F, J, N are statistically insignificant and
    # dropped (reference prints the same three warnings)
    assert prfl.block_count() == 17
    assert prfl[0].id == "PF00171.15_A"
    assert prfl[0].size == 20
    ids = [b.id for b in prfl.blocks]
    assert "PF00171.15_F" not in ids and "PF00171.15_J" not in ids


def test_fastblock_forward_golden():
    seq = _planted_sequence()
    prfl = Profile(PRFL)
    groups = search(seq, prfl, cutoff=0.5)
    text = format_results("planted test", groups)
    with open(os.path.join(HERE, "data", "golden_ppx_fbs.out")) as fh:
        assert text == fh.read()


def test_fastblock_reverse_golden():
    seq = _planted_sequence()
    rc = "".join({"a": "t", "c": "g", "g": "c", "t": "a"}[c]
                 for c in reversed(seq))
    prfl = Profile(PRFL)
    groups = search(rc, prfl, cutoff=0.5)
    text = format_results("planted rc test", groups)
    with open(os.path.join(HERE, "data", "golden_ppx_fbs_rc.out")) as fh:
        assert text == fh.read()


def test_simscore_examples():
    ss = SimilarityScore()
    ss.read(os.path.join(SIMDIR, "EDW03868.1.fa"),
            os.path.join(SIMDIR, "EOG09150290.prfl"))
    ss.fill()
    assert f"{ss.score():.6g}" == "937.084"   # reference pp_simScore

    ss2 = SimilarityScore(intron_weight_inter=0.0, gap_inter=-3.0)
    ss2.read(os.path.join(SIMDIR, "EDW03868.1.fa"),
             os.path.join(SIMDIR, "EOG09150290.prfl"))
    ss2.fill()
    assert f"{ss2.score():.6g}" == "925.206"


def test_msa2prfl_roundtrip():
    """msa2prfl builds a profile that PP::Profile-parses, with correct
    block widths and interblock distances; fastBlockSearch then finds a
    sequence planted from the profile consensus."""
    from augustus_tpu.ppx.msa2prfl import msa_to_prfl
    rng = np.random.RandomState(7)
    cores = ["MKTLLVAGGHS", "WWDDEEPPKKRRAA", "FYHGGMMCCSTV"]

    def mutate(s, k):
        s = list(s)
        for i in rng.choice(len(s), k, replace=False):
            s[i] = AA_SYMBOLS[rng.randint(20)]
        return "".join(s)

    rows = []
    for _ in range(6):
        l1 = list("----------")
        for j in rng.choice(10, 4, replace=False):
            l1[j] = "A"
        l2 = list("--------")
        for j in rng.choice(8, 3, replace=False):
            l2[j] = "S"
        rows.append(mutate(cores[0], 1) + "".join(l1) +
                    mutate(cores[1], 2) + "".join(l2) +
                    mutate(cores[2], 1))
    text = msa_to_prfl(rows, name="toy")
    import tempfile
    tf = tempfile.NamedTemporaryFile("w", suffix=".prfl", delete=False)
    tf.write(text)
    tf.close()
    prfl = Profile(tf.name)
    assert [(b.id, b.size) for b in prfl.blocks] == \
        [("toy_A", 11), ("toy_B", 14), ("toy_C", 12)]
    assert [(b.distance.min, b.distance.max) for b in prfl.blocks] == \
        [(0, 0), (4, 4), (3, 3)]

    # plant the consensus DNA and search for it
    gc = genetics.GeneticCode(1)
    aa2codon = {}
    for cid in range(64):
        aa = str(gc.aa_of_codon[cid])
        aa2codon.setdefault(aa, "".join(
            "acgt"[(cid >> (2 * (2 - i))) & 3] for i in range(3)))

    def rand_dna(n):
        return "".join("acgt"[i] for i in rng.randint(0, 4, n))

    dna = rand_dna(300)
    for core in cores:
        dna += "".join(aa2codon[a] for a in core) + rand_dna(18)
    dna += rand_dna(300)
    groups = search(dna, prfl, cutoff=0.2)
    assert groups, "no hit group found"
    ids = {h["block_id"] for g in groups for h in g["hits"]}
    assert {"toy_A", "toy_B", "toy_C"} <= ids
    # the best chain contains at least two of the blocks in order
    best = [h["block_id"] for h in groups[-1]["hits"]]
    assert len(best) >= 2 and best == sorted(best)


def test_prepare_align_drops_block_breaking_sequence():
    """prepareAlign objective: deleting a gap-riddled sequence that
    destroys block columns must increase net block area; conserved
    sequences stay."""
    from augustus_tpu.ppx.prepare_align import prepare_align
    good = "MKTLLVAGGHSWWDDEE"
    # 3 clean + 1 gap-riddled: the bad sequence pulls block columns
    # below FULL_COL_WEIGHT=0.8 (3/4 = 0.75), killing all blocks
    rows = [good] * 3 + ["M-T--V-G--SW--D-E"]
    names = [f"s{i}" for i in range(4)]
    kept_names, kept_rows = prepare_align(names, rows)
    assert "s3" not in kept_names
    assert len(kept_rows) == 3 and all(r == good for r in kept_rows)

    # an already-clean alignment is untouched
    kept_names2, kept_rows2 = prepare_align(names[:3], [good] * 3)
    assert kept_names2 == names[:3]
