"""Dev harness: run the gold engine on HS04636 and compare the Viterbi path
coding exons against the reference binary's output."""
import sys, time
sys.path.insert(0, "/root/repo")

import numpy as np
from augustus_tpu import genetics
from augustus_tpu.properties import init_properties
from augustus_tpu.constants import Constants
from augustus_tpu.model.state_config import parse_state_config, ST
from augustus_tpu.model import pbl, gc as gcmod
from augustus_tpu.io.fasta import read_fasta
from augustus_tpu.engine.gold import GoldEngine, exon_geometry

CFG = "/root/reference/config"

props = init_properties({"species": "human", "AUGUSTUS_CONFIG_PATH": CFG,
                         "UTR": "off", "softmasking": "0"})
cn = Constants.from_properties(props)
sg = parse_state_config(props)
igp = pbl.read_igenic_pbl(props.species_file("_igenic_probs.pbl"), cn.decomp_num_steps)
exp = pbl.read_exon_pbl(props.species_file("_exon_probs.pbl"), cn.decomp_num_steps, cn,
                        k=props.get_int("/ExonModel/k", 4))
inp = pbl.read_intron_pbl(props.species_file("_intron_probs.pbl"), cn.decomp_num_steps, cn, props)
decomp = gcmod.make_decomposition(cn, props)

fa = read_fasta(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples/HS04636.fa")
codes = genetics.encode(fa[0].sequence.lower())
print(f"n = {codes.shape[0]}")

eng = GoldEngine(sg, cn, igp, exp, inp, decomp)
t0 = time.time()
eng.run(codes)
print(f"DP time: {time.time()-t0:.1f}s  log path prob will follow")

segs = eng.traceback()
print(f"path log prob = {eng.path_log_prob:.4f}")
from augustus_tpu.model.state_config import TYPE_TO_IDENTIFIER, is_coding_exon
for (b, e, t) in segs:
    if t == ST.igenic:
        continue
    g = exon_geometry(t, cn) if is_coding_exon(t) else None
    note = ""
    if g is not None:
        # biological exon coordinates (1-based, like GFF)
        if t in (ST.singleG, ST.initial0, ST.initial1, ST.initial2):
            bb = b + cn.trans_init_window
        elif t in (ST.rsingleG, ST.rterminal0, ST.rterminal1, ST.rterminal2):
            bb = b
        elif g.forward:
            bb = b - cn.ass_end
        else:
            bb = b - cn.dss_start
        ee = e + g.base_offset
        note = f"  bio: {bb+1}-{ee+1}"
    print(f"{b:6d} {e:6d}  {TYPE_TO_IDENTIFIER[t]:12s}{note}")
