"""High-level prediction driver: sequences in, GFF text out.

Mirrors the reference flow augustus.cc predictOnInputSequences ->
NAMGene::doViterbiPiecewise -> getStepGenes -> findGenes for the
single-piece, viterbi-only case (sampling/piecewise layers come on top).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from . import genetics
from .constants import Constants
from .properties import Properties, init_properties
from .model.state_config import parse_state_config, StateGraph
from .model import pbl, gc as gcmod
from .engine.gold import GoldEngine
from .io.fasta import FastaRecord, read_fasta
from .output import genes as og


@dataclass
class Model:
    """A loaded species model (parameters + topology + constants)."""
    props: Properties
    cn: Constants
    sg: StateGraph
    igp: pbl.IgenicParams
    exp: pbl.ExonParams
    inp: pbl.IntronParams
    decomp: gcmod.Decomposition
    gcode: genetics.GeneticCode
    utr: object = None
    utr_cfg: object = None
    ext_cfg: object = None
    gff_hints: object = None

    @classmethod
    def load(cls, args: dict, config_path: Optional[str] = None) -> "Model":
        props = init_properties(args, config_path)
        cn = Constants.from_properties(props)
        sg = parse_state_config(props)
        igp = pbl.read_igenic_pbl(props.species_file("_igenic_probs.pbl"),
                                  cn.decomp_num_steps)
        exp = pbl.read_exon_pbl(props.species_file("_exon_probs.pbl"),
                                cn.decomp_num_steps, cn,
                                k=props.get_int("/ExonModel/k", 4))
        inp = pbl.read_intron_pbl(props.species_file("_intron_probs.pbl"),
                                  cn.decomp_num_steps, cn, props)
        decomp = gcmod.make_decomposition(cn, props)
        table = props.get_int("translation_table", 1)
        utr = utr_cfg = None
        if any(mc == "utrmodel" for mc in sg.model_class):
            from .engine.gold_utr import UtrConfig
            utr = pbl.read_utr_pbl(props.species_file("_utr_probs.pbl"),
                                   cn.decomp_num_steps, cn, props, inp)
            utr_cfg = UtrConfig.from_properties(props)
        ext_cfg = None
        gff_hints = None
        from .hints import config as hints_config
        path = hints_config.default_config_path(props)
        if path is not None and (cn.softmasking or "hintsfile" in props):
            ext_cfg = hints_config.read_extrinsic_cfg(path)
        if "hintsfile" in props and ext_cfg is not None:
            from .hints import system as hints_system
            intron_geo = 1.0 - 1.0 / inp.gc[0].mal if inp.gc else None
            gff_hints = hints_system.parse_gff_hints(
                props.get("hintsfile"), ext_cfg, intron_geo=intron_geo)
        return cls(props=props, cn=cn, sg=sg, igp=igp, exp=exp, inp=inp,
                   decomp=decomp, gcode=genetics.GeneticCode(table),
                   utr=utr, utr_cfg=utr_cfg, ext_cfg=ext_cfg,
                   gff_hints=gff_hints)


def predict_sequence(model: Model, rec: FastaRecord, seq_number: int = 1,
                     geneid_start: int = 1, engine: str = "gold") -> tuple:
    """Predict genes on one sequence; returns (gff_text, n_genes).

    engine: "gold" (host float64, exact) or "scan" (device float32 fast
    path; identical except float near-ties / conv-capped exon lengths).
    """
    cn = model.cn
    props = model.props
    codes = genetics.encode(rec.sequence.lower())
    gold = GoldEngine(model.sg, cn, model.igp, model.exp, model.inp,
                      model.decomp, model.gcode, utr=model.utr,
                      utr_cfg=model.utr_cfg, ext_cfg=model.ext_cfg)
    softmask = genetics.softmask_runs(rec.sequence)
    gff_hints = model.gff_hints.get(rec.name, []) \
        if getattr(model, "gff_hints", None) is not None else None

    # sampling configuration (reference namgene.cc:54-92,768)
    sample_iters = props.get_int("sample", 0)
    if 0 < sample_iters < 10:
        sample_iters = 0       # reference refuses too-low sample counts
    if sample_iters < 1:
        sample_iters = 1
    need_forward = sample_iters > 1
    alt_sampling = props.get_bool("alternatives-from-sampling", False)
    keep_viterbi = props.get_bool("keep_viterbi", False)
    minep = props.get_float("minexonintronprob", 0.0)
    minmep = props.get_float("minmeanexonintronprob", 0.0)

    if engine == "scan" and not need_forward:
        from .engine.device import build_tracks
        from .engine.scan import ScanEngine
        gold.prepare(codes, softmask=softmask, gff_hints=gff_hints)
        se = ScanEngine(build_tracks(gold))
        se.run()
        segments = se.traceback()
    else:
        gold.run(codes, softmask=softmask, gff_hints=gff_hints,
                 need_forward=need_forward)
        segments = gold.traceback()

    path = og.condense_path(segments, codes.shape[0])
    genes = og.project_onto_genes(path, cn)
    # reference NAMGene::findGenes (namgene.cc:812-906): viterbi transcripts
    # enter with weight 1, sampled paths accumulate posterior counts
    alltranscripts = list(genes)
    for g in alltranscripts:
        g.apostprob = 1.0
        g.set_state_postprobs(1.0)
        g.set_sample_count(1)
        g.has_probs = True
        g.throwaway = False
        g.viterbi = True
    if need_forward:
        rng = np.random.default_rng(props.get_int("seed", 1))
        for _ in range(sample_iters - 1):
            segs = gold.sample_path(rng)
            spath = og.condense_path(segs, codes.shape[0])
            for g in og.project_onto_genes(spath, cn):
                g.apostprob = 1.0
                g.set_state_postprobs(1.0)
                g.set_sample_count(1)
                g.has_probs = True
                g.viterbi = False
                g.throwaway = not alt_sampling
                alltranscripts.append(g)
        alltranscripts.sort(key=lambda g: g.gene_begin())  # stable
        # merge identical transcripts (namgene.cc:877-892)
        i = 0
        while i < len(alltranscripts):
            a = alltranscripts[i]
            j = i + 1
            while j < len(alltranscripts) and \
                    alltranscripts[j].gene_begin() == a.gene_begin():
                b = alltranscripts[j]
                if a.states_equal(b):
                    a.throwaway = a.throwaway and b.throwaway
                    a.viterbi = a.viterbi or b.viterbi
                    a.add_sample_count(1)
                    a.apostprob += 1.0
                    a.add_state_postprobs(1.0)
                    del alltranscripts[j]
                else:
                    j += 1
            i += 1
        # cross-transcript state posteriors (namgene.cc:897-905)
        for i, a in enumerate(alltranscripts):
            for b in alltranscripts[i + 1:]:
                if b.gene_begin() > a.gene_end():
                    break
                a.update_post_prob(b)
        for a in alltranscripts:
            a.norm_post_prob(sample_iters)

    genes = og.filter_transcripts(
        alltranscripts, codes, cn, model.gcode,
        no_in_frame_stop=props.get_bool("noInFrameStop", False),
        keep_viterbi=keep_viterbi, minexonintronprob=minep,
        minmeanexonintronprob=minmep)
    genes = og.max_tracks_order(genes, keep_viterbi=keep_viterbi)
    agl = og.group_transcripts(genes)
    agl.sort(key=lambda ag: ag.mincodstart)  # AltGene::operator< (stable)
    if not need_forward:
        # reference findGenes else-branch (namgene.cc:945-952)
        for ag in agl:
            for tx in ag.transcripts:
                tx.has_probs = False
                tx.set_state_has_score(False)
    for ag in agl:
        og.sort_transcripts(ag)
    gid = geneid_start
    for ag in agl:
        ag.id = f"g{gid}"
        ag.seqname = rec.name
        gid += 1
        tid = 1
        for tx in ag.transcripts:
            tx.seqname = rec.name
            tx.id = f"t{tid}"
            tx.geneid = ag.id
            tid += 1

    o = og.OutputOptions.from_properties(model.props)
    with_evidence = bool(getattr(gold, "has_hints", False)) or \
        getattr(model, "gff_hints", None) is not None
    if with_evidence:
        from .output import evidence as ev
        groups = gold.hints.groups if gold.hints is not None else []
        for ag in agl:
            for tx in ag.transcripts:
                ev.compile_evidence(tx, groups)
    header = [
        f"#",
        f"# ----- prediction on sequence number {seq_number} "
        f"(length = {len(rec.sequence)}, name = {rec.name}) -----",
        f"#",
        f"# Predicted genes for sequence number {seq_number} on both strands",
    ]
    body = og.print_gene_list(agl, codes, o, model.gcode,
                              with_evidence=with_evidence)
    if not agl:
        body = "# (none)\n"
    return "\n".join(header) + "\n" + body, len(agl)


def predict_file(model: Model, path: str, engine: str = "gold") -> str:
    recs = read_fasta(path)
    chunks = []
    gid = 1
    for i, rec in enumerate(recs):
        text, ngenes = predict_sequence(model, rec, seq_number=i + 1,
                                        geneid_start=gid, engine=engine)
        gid += ngenes
        chunks.append(text)
    return "".join(chunks)
